"""Interleaved phase_iters sweep for the device-side net2 schedule.

Phase-1 trips run at FULL batch width; every trip past the typical
convergence count (~14 at net2) is straggler work that could ride the
rescue_width-narrow (B//16) gathered rescue instead.  This sweeps the
phase-1 cap interleaved in one process, plus a B=32768 point to re-test
batch saturation under the single-program schedule (the round-3
"flat past 16384" measurement was host-driven).

All variants share the adaptive-lanes kernels already warm in the
persistent cache (phase_iters is a loop bound, not a kernel shape).

Usage:  python validation/bench_phase_iters.py   (TPU, detached)
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.utils.cache import enable_persistent_cache

enable_persistent_cache()
from hpfx.lanes import hpf_sweep_adaptive_lanes  # noqa: E402
from hpfx.solve import Scenarios, hpf_sweep_device  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")
REPS = int(os.environ.get("HPFX_PI_REPS", "3"))


def scen_of(B, k):
    return Scenarios(
        p_scale=jnp.asarray(np.linspace(0.8, 1.2, B) + 1e-4 * k,
                            jnp.float32),
        q_scale=jnp.asarray(np.linspace(0.8, 1.2, B), jnp.float32),
        injection_scale=jnp.asarray(np.linspace(0.6, 1.4, B), jnp.float32))


def main():
    s = hpfx.settings_for_hmax(25, coupled=True).with_(
        solver="arrow", stable_mismatch=True, big_solve="panel")
    net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                            os.path.join(DATA, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)

    variants = {}
    for pi in (14, 16, 20, 24):
        f = jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                            phase_iters=pi))
        variants[f"pi{pi}_B16384"] = (16384, partial(
            hpf_sweep_device, net, dev, s, jitted=f))
    f24 = jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                          phase_iters=24))
    variants["pi24_B32768"] = (32768, partial(
        hpf_sweep_device, net, dev, s, jitted=f24))

    for name, (B, fn) in variants.items():
        t0 = time.perf_counter()
        np.asarray(fn(scen_of(B, -1)).V_m)
        print(json.dumps({"variant": name, "event": "warm",
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    for k in range(REPS):
        for name, (B, fn) in variants.items():
            sc = scen_of(B, k)
            t0 = time.perf_counter()
            r = fn(sc)
            np.asarray(r.V_m)
            dt = time.perf_counter() - t0
            conv = float(np.mean(np.asarray(r.converged)))
            print(json.dumps({
                "variant": name, "rep": k, "conv": round(conv, 4),
                "solves_per_sec": round(conv * B / dt, 1),
                "wall_s": round(dt, 3)}), flush=True)


if __name__ == "__main__":
    main()
