"""Pallas kernel tests (interpret mode on the CPU mesh; the compiled TPU
path is exercised by bench.py on hardware)."""
import jax
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


def test_solve_blocks_vmap_flattening():
    """solve_blocks' custom vmap rule flattens (scenario, harmonic) into
    one batch; results must equal per-scenario LAPACK solves exactly in
    semantics (CPU backend: both paths are LAPACK)."""
    import jax

    from hpfx.ops.batched_solve import solve_blocks
    B, H, k, R = 3, 5, 8, 4
    D = (rng.normal(size=(B, H, k, k)) +
         3.0 * np.sqrt(k) * np.eye(k)).astype(np.float32)
    rhs = rng.normal(size=(B, H, k, R)).astype(np.float32)
    out = jax.vmap(solve_blocks)(jnp.asarray(D), jnp.asarray(rhs))
    ref = np.linalg.solve(D, rhs)
    np.testing.assert_allclose(np.asarray(out), ref,
                               atol=1e-4 * np.abs(ref).max())
    # unbatched base case
    one = solve_blocks(jnp.asarray(D[0]), jnp.asarray(rhs[0]))
    np.testing.assert_allclose(np.asarray(one), ref[0],
                               atol=1e-4 * np.abs(ref).max())


def test_batched_solve_multi_rhs_dispatch_cpu():
    """The dispatcher accepts (B, n, R) right-hand sides on every path."""
    A, _, _ = _systems(4, 12)
    R = 3
    rhs = rng.normal(size=(4, 12, R)).astype(np.float32)
    x = batched_solve(jnp.asarray(A), jnp.asarray(rhs))
    ref = np.linalg.solve(A, rhs)
    np.testing.assert_allclose(np.asarray(x), ref,
                               atol=1e-4 * np.abs(ref).max())


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


def test_equilibration_restores_f32_accuracy():
    """Row/column max-abs equilibration (applied on the f32 solve path):
    exact for diagonal scalings, and decisively more accurate when rows
    span several orders of magnitude — the HPF Jacobian's shape (power
    rows O(1), current rows O(|Y|) ~ 1e4)."""
    from hpfx.ops.batched_solve import _lu_solve, equilibrated
    B, n = 8, 60
    A, b, _ = _systems(B, n)
    # blow up half the rows by 1e4 (keeps the exact solution if b scales)
    scale = np.ones((1, n, 1), np.float32)
    scale[:, ::2] = 1e4
    A64 = A.astype(np.float64) * scale
    b64 = b.astype(np.float64) * scale[..., 0]
    ref = np.linalg.solve(A64, b64[..., None])[..., 0]
    As, bs = A64.astype(np.float32), b64.astype(np.float32)
    x_eq = np.asarray(equilibrated(_lu_solve)(jnp.asarray(As),
                                              jnp.asarray(bs)))
    err_eq = np.abs(x_eq - ref).max() / np.abs(ref).max()
    x_raw = np.asarray(_lu_solve(jnp.asarray(As), jnp.asarray(bs)))
    err_raw = np.abs(x_raw - ref).max() / np.abs(ref).max()
    assert err_eq < 1e-4, err_eq
    assert err_eq <= err_raw * 1.5  # never meaningfully worse


def test_schur_solve_lanes_algebra():
    """Blocked panel-Schur solve (the large-dim TPU path) vs LAPACK, with
    a LAPACK leaf so the block algebra is isolated from the kernel.
    Covers panel recursion depth > 4 (n = 182, panel 32) and the
    beyond-VMEM-budget dim class (n = 364 > MAX_PALLAS_DIM)."""
    from hpfx.ops.batched_solve import (_lu_solve_lanes, equilibrated_lanes,
                                        schur_solve_lanes)
    # run under jit: executing the recursion eagerly compiles hundreds of
    # tiny ops, which has segfaulted XLA:CPU's compiler in-suite (x64 +
    # memory pressure); one jitted program sidesteps that and matches how
    # the solver is actually used
    for n, B, R, panel in [(182, 8, 1, 48), (150, 4, 3, 48),
                           (364, 2, 1, 96), (136, 4, 2, 64)]:
        A = rng.normal(size=(n, n, B)).astype(np.float32)
        A += 0.1 * n * np.eye(n, dtype=np.float32)[:, :, None]
        b = rng.normal(size=(n, R, B)).astype(np.float32)
        x = jax.jit(equilibrated_lanes(
            lambda M, v: schur_solve_lanes(M, v, leaf=_lu_solve_lanes,
                                           panel=panel)))(
            jnp.asarray(A), jnp.asarray(b))
        ref = np.stack([np.linalg.solve(A[..., i], b[..., i])
                        for i in range(B)], axis=-1)
        np.testing.assert_allclose(np.asarray(x), ref,
                                   atol=2e-4 * np.abs(ref).max())


def test_schur_solve_capacitance_accuracy():
    """On Woodbury-capacitance-style systems (I + coupling, the arrow
    solver's S matrix), the panel-blocked f32 solve stays within ~2x of
    the fully-pivoted direct solve's error vs an f64 reference — the
    regression gate for the block-diagonal-pivoting compromise."""
    from hpfx.ops.batched_solve import (_lu_solve_lanes, equilibrated_lanes,
                                        schur_solve_lanes)
    n, B = 182, 16
    C = rng.normal(size=(n, n, B)) * (0.8 / np.sqrt(n))
    A64 = np.eye(n)[:, :, None] + C
    b64 = rng.normal(size=(n, 1, B))
    ref = np.stack([np.linalg.solve(A64[..., i], b64[..., i])
                    for i in range(B)], axis=-1)
    A32 = jnp.asarray(A64, jnp.float32)
    b32 = jnp.asarray(b64, jnp.float32)
    x_direct = np.asarray(equilibrated_lanes(_lu_solve_lanes)(A32, b32))
    x_schur = np.asarray(jax.jit(equilibrated_lanes(
        lambda M, v: schur_solve_lanes(M, v, leaf=_lu_solve_lanes,
                                       panel=48)))(A32, b32))
    scale = np.abs(ref).max()
    err_direct = np.abs(x_direct - ref).max() / scale
    err_schur = np.abs(x_schur - ref).max() / scale
    assert err_schur < 1e-4, err_schur
    assert err_schur <= max(2.5 * err_direct, 5e-6), (err_schur, err_direct)


def test_panel_gj_solve_interpret():
    """Full-pivot blocked panel Gauss-Jordan (the large-dim path that
    keeps the direct kernel's pivot rule): interpret-mode kernel vs
    LAPACK, including a needs-pivoting (zero-diagonal) case and pad
    handling (n not a panel multiple)."""
    from hpfx.ops.batched_solve import panel_gj_solve_lanes
    for n, B, R, panel in [(40, 3, 2, 16), (100, 2, 1, 32)]:
        A = rng.normal(size=(n, n, B)).astype(np.float32)
        A += 0.1 * n * np.eye(n, dtype=np.float32)[:, :, None]
        b = rng.normal(size=(n, R, B)).astype(np.float32)
        x = panel_gj_solve_lanes(jnp.asarray(A), jnp.asarray(b),
                                 panel=panel, interpret=True)
        ref = np.stack([np.linalg.solve(A[..., i], b[..., i])
                        for i in range(B)], axis=-1)
        np.testing.assert_allclose(np.asarray(x), ref,
                                   atol=1e-4 * np.abs(ref).max())
    n, B = 48, 2
    A = rng.normal(size=(n, n, B)).astype(np.float32)
    A[np.arange(n), np.arange(n)] = 0.0       # no-pivot -> needs row swaps
    b = rng.normal(size=(n, 1, B)).astype(np.float32)
    x = panel_gj_solve_lanes(jnp.asarray(A), jnp.asarray(b), panel=16,
                             interpret=True)
    ref = np.stack([np.linalg.solve(A[..., i], b[..., i])
                    for i in range(B)], axis=-1)
    np.testing.assert_allclose(np.asarray(x), ref,
                               atol=1e-3 * np.abs(ref).max())
