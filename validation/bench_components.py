"""Component-level TPU timing harness (round-2 starter).

Times each stage of the batched NR trip separately on the real chip so
optimization effort goes where the time is:
  1. Ybus assembly                      (once per sweep)
  2. batched harmonic mismatch          (per trip)
  3. batched Jacobian assembly          (per trip; scatter-free since r1)
  4. batched Newton solve               (per trip; Pallas GJ vs XLA LU)
  5. full hpf_sweep end to end

Usage: python validation/bench_components.py [B] [net] [h_max]
(defaults: 1024 net2 25)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx import harmonic
from hpfx.cx import Cx
from hpfx.ops.batched_solve import gauss_solve_pallas
from hpfx.solve import Scenarios, hpf_sweep

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
NET = sys.argv[2] if len(sys.argv) > 2 else "net2"
HMAX = int(sys.argv[3]) if len(sys.argv) > 3 else 25


def _sync(out):
    """Force device completion by host-materializing one scalar per leaf.

    block_until_ready does NOT synchronize on the axon relay (BENCH_NOTES
    "measurement integrity") — only host transfers wait, so the sync is a
    reduction to a scalar pulled to the host.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:35s} {dt * 1e3:8.2f} ms")
    return out


def main():
    s = hpfx.settings_for_hmax(HMAX, coupled=True)
    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "hpfx", "data")
    net = hpfx.load_network(os.path.join(data, f"{NET}_buses.csv"),
                            os.path.join(data, f"{NET}_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    m, n, c, H = net.m, net.n, net.c, s.n_harmonics
    S = Cx(net.bus_P, net.bus_Q)
    print(f"backend={jax.default_backend()} B={B} dim={2*H*n-1-c}")

    Y = timeit("ybus", jax.jit(
        lambda: hpfx.build_ybus(net, s)))

    rng = np.random.default_rng(0)
    V_m = jnp.asarray(0.1 + 0.9 * rng.random((B, H, n)), jnp.float32)
    V_a = jnp.asarray(0.1 * rng.random((B, H, n)), jnp.float32)

    mism = jax.jit(jax.vmap(
        lambda vm, va: harmonic.harmonic_mismatch(vm, va, Y, S, dev,
                                                  m, n, c)[0]))
    timeit("batched mismatch", mism, V_m, V_a)

    jac = jax.jit(jax.vmap(
        lambda vm, va: harmonic.build_harmonic_jacobian(vm, va, Y, dev,
                                                        m, n, c)))
    J = timeit("batched J assembly", jac, V_m, V_a)

    from hpfx.ops.batched_solve import MAX_PALLAS_DIM
    f = jnp.asarray(rng.standard_normal((B, J.shape[1])), jnp.float32)
    if jax.default_backend() != "cpu" and J.shape[1] <= MAX_PALLAS_DIM:
        timeit("Pallas GJ solve (dense J)", jax.jit(gauss_solve_pallas),
               J, f)
    timeit("XLA batched LU (dense J)", jax.jit(
        lambda A, b: jnp.linalg.solve(A, b[..., None])[..., 0]), J, f)

    # structured arrow Newton step: pieces assembly + block/Woodbury solve
    from hpfx.arrow import arrow_solve, build_arrow_pieces, make_arrow_index
    idx = make_arrow_index(H, n, m, c)
    pieces_fn = jax.jit(jax.vmap(
        lambda vm, va: build_arrow_pieces(vm, va, Y, dev, idx)))
    pieces = timeit("arrow pieces assembly", pieces_fn, V_m, V_a)
    timeit("arrow block+Woodbury solve", jax.jit(jax.vmap(
        lambda p_, f_: arrow_solve(p_, f_, idx))), pieces, f)

    scen = Scenarios(p_scale=jnp.linspace(0.8, 1.2, B),
                     q_scale=jnp.linspace(0.8, 1.2, B),
                     injection_scale=jnp.linspace(0.6, 1.4, B))
    for solver in ("dense", "arrow"):
        res = timeit(f"hpf_sweep end-to-end [{solver}]", lambda: hpf_sweep(
            net, dev, settings=s.with_(solver=solver), scenarios=scen),
            reps=3)
        conv = float(jnp.mean(res.converged.astype(jnp.float32)))
        print(f"  conv={conv:.3f}; mean iters="
              f"{float(jnp.mean(res.n_iter.astype(jnp.float32))):.1f}")


if __name__ == "__main__":
    main()
