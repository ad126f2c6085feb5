"""Lane-major trip attribution on the real chip (round-2).

Times the pieces of the lanes arrow Newton trip separately at reference
scale so optimization goes where the time is:
  1. mismatch_lanes                        (per trip)
  2. arrow_step_lanes (full Newton solve)  (per trip)
  3. the harmonic-block multi-RHS solve    (inside 2)
  4. the Woodbury capacitance solve        (inside 2)
  5. one full trip (step + update + mismatch)
  6. hpf_sweep end to end

Isolated jit calls carry a ~3 ms relay dispatch floor (BENCH_NOTES
round-2 negative results #15) — read sub-10-ms rows as upper bounds.

Usage: python validation/bench_lanes.py [B] [net] [h_max]
(defaults: 512 net1 25)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx import lanes as L
from hpfx.cx import Cx
from hpfx.ops.batched_solve import batched_solve_lanes
from hpfx.solve import Scenarios, hpf_sweep
from hpfx.ybus import build_ybus, line_ybus_pair

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NET = sys.argv[2] if len(sys.argv) > 2 else "net1"
HMAX = int(sys.argv[3]) if len(sys.argv) > 3 else 25
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")


def _sync(out):
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
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return out


def main():
    s = hpfx.settings_for_hmax(HMAX, coupled=True).with_(
        solver="arrow", stable_mismatch=True, layout="lanes")
    net = hpfx.load_network(os.path.join(DATA, f"{NET}_buses.csv"),
                            os.path.join(DATA, f"{NET}_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    H, n, m, c = s.n_harmonics, net.n, net.m, net.c
    rd = s.real_dtype
    print(f"{NET} H={H} n={n} m={m} c={c} B={B} dim={2*H*n-1-c}",
          flush=True)

    Y = build_ybus(net, s)
    lineY, _ = line_ybus_pair(net, s)
    consts = L._make_arrow_consts(H, n, m, c)

    rng = np.random.default_rng(0)
    V_m = jnp.asarray(
        0.9 + 0.1 * rng.random((H, n, B)), rd).at[0].set(1.0)
    V_a = jnp.asarray(0.1 * rng.random((H, n, B)), rd)
    S = Cx(jnp.asarray(np.broadcast_to(np.asarray(net.bus_P)[:, None],
                                       (n, B)).copy(), rd),
           jnp.asarray(np.broadcast_to(np.asarray(net.bus_Q)[:, None],
                                       (n, B)).copy(), rd))
    inj = jnp.ones((B,), rd)
    f = jnp.asarray(rng.standard_normal((2 * H * n - 1 - c, B)), rd)

    mm = jax.jit(lambda vm, va: L.mismatch_lanes(
        vm, va, Y, S, dev, inj, m, n, c, lineY))
    timeit("mismatch_lanes", mm, V_m, V_a)

    step = jax.jit(lambda vm, va, ff: L.arrow_step_lanes(
        vm, va, ff, Y, dev, inj, consts))
    timeit("arrow_step_lanes (full)", step, V_m, V_a, f)

    # isolated inner solves (same shapes the step uses)
    n_nl = n - m
    r = 2 * H * n_nl
    r_blk = 2 * n_nl
    k2 = 2 * n
    R = 1 + r_blk
    D_flat = jnp.asarray(rng.standard_normal((k2, k2, H * B)), rd) \
        + 4.0 * jnp.eye(k2, dtype=rd)[:, :, None]
    rhs_flat = jnp.asarray(rng.standard_normal((k2, R, H * B)), rd)
    bs = jax.jit(batched_solve_lanes)
    timeit(f"block solve ({k2}x{k2} x {H*B}, R={R})", bs, D_flat, rhs_flat)

    S_w = jnp.asarray(rng.standard_normal((r, r, B)), rd) \
        + (2.0 * r) * jnp.eye(r, dtype=rd)[:, :, None]
    rhs_w = jnp.asarray(rng.standard_normal((r, 1, B)), rd)
    timeit(f"capacitance solve ({r}x{r} x {B})", bs, S_w, rhs_w)

    def trip(vm, va, ff):
        dx = L.arrow_step_lanes(vm, va, ff, Y, dev, inj, consts)
        D = H * n
        x = jnp.concatenate([va.reshape(D, B)[1:],
                             vm.reshape(D, B)[c:]], axis=0) - dx
        va2 = jnp.concatenate([va.reshape(D, B)[:1], x[: D - 1]],
                              axis=0).reshape(H, n, B)
        vm2 = jnp.concatenate([vm.reshape(D, B)[:c], x[D - 1:]],
                              axis=0).reshape(H, n, B)
        f2, err = L.mismatch_lanes(vm2, va2, Y, S, dev, inj, m, n, c, lineY)
        return vm2, va2, f2, err

    timeit("one full trip (step+update+mismatch)", jax.jit(trip),
           V_m, V_a, f)

    scen = Scenarios(
        p_scale=jnp.asarray(np.linspace(0.8, 1.2, B), rd),
        q_scale=jnp.asarray(np.linspace(0.8, 1.2, B), rd),
        injection_scale=jnp.asarray(np.linspace(0.6, 1.4, B), rd))
    sweep = lambda sc: hpf_sweep(net, dev, settings=s, scenarios=sc)
    out = timeit("hpf_sweep end-to-end", sweep, scen, reps=3)
    print(f"  conv={float(np.mean(np.asarray(out.converged))):.3f} "
          f"mean_iters={float(np.mean(np.asarray(out.n_iter))):.1f} "
          f"max_iters={int(np.max(np.asarray(out.n_iter)))}", flush=True)


if __name__ == "__main__":
    main()
