"""Pallas kernel tests (interpret mode on the CPU mesh; the compiled TPU
path is exercised by bench.py on hardware)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hpfx.ops import batched_solve
from hpfx.ops.batched_solve import MAX_PALLAS_DIM, gauss_solve_pallas

rng = np.random.default_rng(7)


def _systems(B, n, cond_boost=3.0):
    A = (rng.normal(size=(B, n, n)) +
         cond_boost * np.sqrt(n) * np.eye(n)).astype(np.float32)
    b = rng.normal(size=(B, n)).astype(np.float32)
    ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(B)])
    return A, b, ref


@pytest.mark.parametrize("n,B", [(3, 4), (6, 16), (40, 8), (102, 4)])
def test_gauss_solve_interpret(n, B):
    A, b, ref = _systems(B, n)
    x = gauss_solve_pallas(jnp.asarray(A), jnp.asarray(b), interpret=True)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(x), ref, atol=3e-5 * scale)


def test_gauss_solve_needs_pivoting():
    """Zero leading diagonal entry: elimination without pivoting would
    divide by zero; the kernel's virtual partial pivoting must handle it."""
    A = np.array([[[0.0, 1.0], [1.0, 0.0]]], np.float32)
    b = np.array([[2.0, 3.0]], np.float32)
    x = gauss_solve_pallas(jnp.asarray(A), jnp.asarray(b), interpret=True)
    np.testing.assert_allclose(np.asarray(x), [[3.0, 2.0]], atol=1e-6)


def test_batched_solve_dispatch_cpu():
    """On CPU the dispatcher uses LAPACK and handles any size/dtype."""
    A, b, ref = _systems(4, 50)
    x = batched_solve(jnp.asarray(A, jnp.float64), jnp.asarray(b, jnp.float64))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-4)
    big = MAX_PALLAS_DIM + 10
    A, b, ref = _systems(2, big)
    x = batched_solve(jnp.asarray(A), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), ref,
                               atol=1e-4 * np.abs(ref).max())


def test_gauss_solve_batch_padding():
    """Batch sizes that don't divide the lane block are zero-padded."""
    A, b, ref = _systems(5, 10)
    x = gauss_solve_pallas(jnp.asarray(A), jnp.asarray(b), interpret=True)
    np.testing.assert_allclose(np.asarray(x), ref,
                               atol=3e-5 * np.abs(ref).max())
    assert x.shape == (5, 10)


def test_gauss_solve_multi_rhs():
    """Multi-RHS elimination (the arrow solver's per-block pattern)."""
    A, _, _ = _systems(6, 20)
    R = 5
    Brhs = rng.normal(size=(6, 20, R)).astype(np.float32)
    x = gauss_solve_pallas(jnp.asarray(A), jnp.asarray(Brhs), interpret=True)
    assert x.shape == (6, 20, R)
    ref = np.stack([np.linalg.solve(A[i], Brhs[i]) for i in range(6)])
    np.testing.assert_allclose(np.asarray(x), ref,
                               atol=3e-5 * np.abs(ref).max())
