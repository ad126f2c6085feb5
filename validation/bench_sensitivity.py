"""TPU timing for the differentiability + transformer capabilities.

Round-3 VERDICT item 3: `line_sensitivity`, `sweep_sensitivity` and the
transformer end-to-end path were CPU-x64-validated only — "capability
parity with the reference's instrumentation requires numbers".  This
harness times all three on the real chip with the established
measurement discipline (BENCH_NOTES "measurement integrity"):

  - host-materialized sync (block_until_ready does NOT synchronize on
    this relay — only host transfers do);
  - every program warmed (compiled + first-dispatched) before timing;
  - fresh inputs per rep;
  - one JSON line per (stage, rep).

NO watchdog: these jacfwd/IFT programs have never executed on the TPU,
and a first dispatch of a new program can take 10-25 min on this
backend (CLAUDE.md #30); killing inside that window wedges the runtime
(#6/#17/#32).  Run detached, after bench.py has proven the chip alive.

Usage:  python validation/bench_sensitivity.py          (TPU)
        HPFX_SENS_BATCH=512 ...                          (sweep width)
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HPFX_SENS_CPU", "0") == "1":   # CPU smoke-test mode
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.utils.cache import enable_persistent_cache

enable_persistent_cache()
from hpfx.network import NONLINEAR, PQ, SLACK  # noqa: E402
from hpfx.sensitivity import (LineParams, line_sensitivity,  # noqa: E402
                              sweep_sensitivity)
from hpfx.solve import Scenarios, hpf_sweep  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")
B = int(os.environ.get("HPFX_SENS_BATCH", "1024"))
REPS = int(os.environ.get("HPFX_SENS_REPS", "4"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sync(tree):
    """Host-materialize every leaf (the only real sync on this relay)."""
    return jax.tree.map(lambda x: np.asarray(x), tree)


def bench_sweep_sensitivity():
    """grads/sec for the batched IFT gradient program on net2 H<=25."""
    s = hpfx.settings_for_hmax(25, coupled=True).with_(
        solver="arrow", stable_mismatch=True, big_solve="panel")
    net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                            os.path.join(DATA, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)

    def scen(k):
        return Scenarios(
            p_scale=jnp.asarray(np.linspace(0.8, 1.2, B) + 1e-4 * k,
                                jnp.float32),
            q_scale=jnp.asarray(np.linspace(0.8, 1.2, B), jnp.float32),
            injection_scale=jnp.asarray(np.linspace(0.6, 1.4, B),
                                        jnp.float32))

    sweep = jax.jit(partial(hpf_sweep, net, dev, settings=s))
    grads = jax.jit(lambda sr, sc: sweep_sensitivity(net, dev, s, sr, sc))

    sc0 = scen(-1)
    sr0 = sweep(scenarios=sc0)
    sync(sr0.V_m)
    g0 = grads(sr0, sc0)                       # warm (first dispatch)
    g0h = sync(g0.grad)
    finite = float(np.mean([np.isfinite(leaf).mean() for leaf in g0h]))
    emit(stage="sweep_sensitivity", event="warm", batch=B,
         finite_frac=round(finite, 6),
         value_range=[float(np.min(np.asarray(g0.value))),
                      float(np.max(np.asarray(g0.value)))])
    for k in range(REPS):
        sc = scen(k)
        sr = sweep(scenarios=sc)
        sync(sr.V_m)
        t0 = time.perf_counter()
        g = grads(sr, sc)
        sync(g.grad)
        dt = time.perf_counter() - t0
        emit(stage="sweep_sensitivity", rep=k, batch=B,
             grads_per_sec=round(B / dt, 1), wall_s=round(dt, 3))


def trafo_fixture(h_max=25):
    s = hpfx.settings_for_hmax(h_max, coupled=True).with_(
        stable_mismatch=True)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("generator", "lin_load", "SMPS"),
        P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2],
        R=[0.5, 1.0], X=[2.0, 4.0],
        tau=[1.05, 1.0], phase_shift=[30.0, 0.0],
        settings=s, per_unit=False)
    dev = hpfx.load_device_set(net, s)
    return s, net, dev


def bench_trafo_e2e():
    """Transformer feeder (tap 1.05, 30deg shift) solved end to end."""
    s, net, dev = trafo_fixture()
    solve = jax.jit(partial(hpfx.hpf, net, dev, s))
    r = solve()
    sync(r.V_m)
    emit(stage="trafo_e2e", event="warm", converged=bool(np.asarray(
        r.converged)), n_iter=int(np.asarray(r.n_iter)))
    for k in range(REPS):
        t0 = time.perf_counter()
        r = solve()
        sync(r.V_m)
        dt = time.perf_counter() - t0
        emit(stage="trafo_e2e", rep=k, solves_per_sec=round(1.0 / dt, 1),
             wall_s=round(dt, 4))


def bench_line_sensitivity():
    """Tap/impedance gradients through build_ybus on the trafo feeder."""
    s, net, dev = trafo_fixture()
    res = hpfx.hpf(net, dev, s)
    sync(res.V_m)
    lp = LineParams(z_scale=jnp.ones(net.n_lines, s.real_dtype))
    lsens_fn = jax.jit(
        lambda r: line_sensitivity(net, dev, s, r, line_params=lp))
    g = lsens_fn(res)
    gh = sync(g.grad)
    emit(stage="line_sensitivity", event="warm",
         d_thd_d_tau=round(float(gh.tau[0]), 6),
         d_thd_d_z1=round(float(gh.z_scale[1]), 6),
         finite=bool(np.all([np.isfinite(leaf).all() for leaf in gh])))
    for k in range(REPS):
        t0 = time.perf_counter()
        g = lsens_fn(res)
        sync(g.grad)
        dt = time.perf_counter() - t0
        emit(stage="line_sensitivity", rep=k,
             grads_per_sec=round(1.0 / dt, 2), wall_s=round(dt, 4))


def main():
    emit(stage="meta", backend=jax.default_backend(),
         device=str(jax.devices()[0]))
    bench_trafo_e2e()
    bench_line_sensitivity()
    bench_sweep_sensitivity()
    if jax.default_backend() == "tpu":
        # un-gate bench.py's sweep_sensitivity stage: this run paid the
        # jacfwd programs' first-dispatch windows (same marker protocol
        # as n128/h99 — a cold cache must never meet bench's watchdog)
        from hpfx.utils.cache import DEFAULT_DIR
        marker_dir = os.environ.get("HPFX_CACHE_DIR") or DEFAULT_DIR
        with open(os.path.join(marker_dir, "sens_primed"), "w") as fh:
            fh.write(time.strftime("%Y-%m-%dT%H:%M:%S\n"))


if __name__ == "__main__":
    main()
