from .batched_solve import batched_solve, gauss_solve_pallas, nr_solve

__all__ = ["batched_solve", "gauss_solve_pallas", "nr_solve"]
