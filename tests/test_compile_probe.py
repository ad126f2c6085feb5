"""AOT compile probes for the Pallas TPU kernels.

This backend has a documented failure mode (CLAUDE.md #4): a miscompiled
kernel can wedge the whole TPU runtime for hours.  The wedge-safe half of
the validation story is *ahead-of-time compilation* — ``.lower().compile()``
exercises the Mosaic compiler (catching lowering regressions, vmem-limit
violations, unsupported ops) without enqueuing anything on the device, and
the AOT service stays up even while the runtime is wedged.

Run with a real TPU backend:

    HPFX_TEST_PLATFORM=tpu python -m pytest tests/test_compile_probe.py -q

Skipped on CPU (the interpret-mode tests in test_ops.py cover semantics
there; only the real Mosaic pipeline makes these probes meaningful).
"""
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="compile probes target the Mosaic TPU compiler")


# every (dim, RHS-count) shape class the solver dispatches to the kernel:
#   - net2-scale dense Newton solve (dim 102, the round-1 headline),
#   - the kernel's maximum dim,
#   - arrow per-harmonic blocks for net2 (2n=8, 1+2 RHS) and net1
#     (2n=40, 1+14 RHS),
#   - arrow Woodbury capacitance solves: dim 26 (net2) and dim 182 (net1)
#     — the latter rides the enlarged-VMEM carried-column kernel (round 2:
#     MAX_PALLAS_DIM = 192), the riskiest launch on this wedge-prone
#     backend and exactly what this wedge-safe tier exists to gate.
KERNEL_SHAPES = [(102, 1, 256), (8, 3, 1024), (40, 15, 256), (26, 1, 512),
                 (182, 1, 512)]


@pytest.mark.parametrize("n,R,B", KERNEL_SHAPES)
def test_gauss_kernel_compiles(n, R, B):
    from hpfx.ops.batched_solve import MAX_PALLAS_DIM, gauss_solve_pallas
    if n > MAX_PALLAS_DIM:
        pytest.skip("beyond the kernel's VMEM budget")
    A = jnp.zeros((B, n, n), jnp.float32)
    b = jnp.zeros((B, n, R) if R > 1 else (B, n), jnp.float32)
    gauss_solve_pallas.lower(A, b).compile()   # already a jit wrapper


def test_max_dim_kernel_compiles():
    from hpfx.ops.batched_solve import MAX_PALLAS_DIM, gauss_solve_pallas
    n = MAX_PALLAS_DIM
    A = jnp.zeros((128, n, n), jnp.float32)
    b = jnp.zeros((128, n), jnp.float32)
    gauss_solve_pallas.lower(A, b).compile()


def test_batched_solve_dispatch_compiles_oversized():
    """Dims over the kernel cap must compile on whatever the dispatcher
    selects (panel GJ by default since round 2)."""
    from hpfx.ops.batched_solve import MAX_PALLAS_DIM, batched_solve
    n = MAX_PALLAS_DIM + 8
    A = jnp.zeros((64, n, n), jnp.float32)
    b = jnp.zeros((64, n), jnp.float32)
    jax.jit(batched_solve).lower(A, b).compile()


def test_lu_fallback_compiles_oversized():
    """The XLA-LU fallback (HPFX_SCHUR=0; crash-prone shape class padded
    to 128 batches, CLAUDE.md #10) keeps its own compile probe even
    though the default dispatch now prefers panel GJ."""
    from hpfx.ops.batched_solve import MAX_PALLAS_DIM, _lu_solve_tpu, \
        equilibrated
    n = MAX_PALLAS_DIM + 8
    A = jnp.zeros((64, n, n), jnp.float32)
    b = jnp.zeros((64, n), jnp.float32)
    jax.jit(equilibrated(_lu_solve_tpu)).lower(A, b).compile()


@pytest.mark.parametrize("solver", ["dense", "arrow"])
def test_sweep_program_compiles(solver):
    """The full batched coupled-HPF sweep program (net2, H<=25) compiles
    for the TPU — the exact program bench.py executes."""
    import os

    import hpfx
    from hpfx.solve import Scenarios, hpf_sweep

    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "hpfx", "data")
    s = hpfx.settings_for_hmax(25, coupled=True).with_(solver=solver)
    net = hpfx.load_network(os.path.join(data, "net2_buses.csv"),
                            os.path.join(data, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    B = 128
    scen = Scenarios(p_scale=jnp.linspace(0.9, 1.1, B),
                     q_scale=jnp.linspace(0.9, 1.1, B),
                     injection_scale=jnp.linspace(0.8, 1.2, B))
    hpf_sweep.lower(net, dev, settings=s, scenarios=scen).compile()


def test_schur_solve_compiles():
    """The blocked panel-Schur composition (large-dim lane-minor path):
    panel GJ kernels + lane-batched matmul trailing updates, at the net1
    capacitance shape and the beyond-VMEM-budget class (n = 364)."""
    from hpfx.ops.batched_solve import equilibrated_lanes, schur_solve_lanes
    for n, B in [(182, 512), (364, 128)]:
        A = jnp.zeros((n, n, B), jnp.float32)
        b = jnp.zeros((n, 1, B), jnp.float32)
        jax.jit(equilibrated_lanes(schur_solve_lanes)).lower(A, b).compile()


def test_panel_gj_compiles():
    """Full-pivot blocked panel GJ (tall-panel kernel + MXU trailing
    updates) at the net1 capacitance shape and past the direct kernel's
    VMEM cap (dim 364 and the dense dim-518 Newton-solve class)."""
    import functools

    from hpfx.ops.batched_solve import panel_gj_solve_lanes
    f = jax.jit(functools.partial(panel_gj_solve_lanes, panel=32))
    for n, B in [(182, 512), (364, 128), (518, 128)]:
        A = jnp.zeros((n, n, B), jnp.float32)
        b = jnp.zeros((n, 1, B), jnp.float32)
        f.lower(A, b).compile()
