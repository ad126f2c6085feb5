"""net1-class interleaved A/B: which schedule wins when stragglers are many?

The round-4 net2 A/B (bench_adaptdev.py) showed the single-program
adaptive sweep (+25%) but its static rescue_width=max(128, B//16)
gather OVERFLOWS on net1 B=2048 (~270 stragglers -> conv 0.87).  Three
candidate resolutions, interleaved in one process (CLAUDE.md #20):

  host_adaptive   the bench-default host-driven two-phase schedule
                  (phase-2 bucket re-solve + _rescue_sweep), conv 1.000
  device+rescue   hpf_sweep_device: the lanes program (width 128) +
                  the host _rescue_sweep on the ~13% overflow lanes
  device_w512     hpf_sweep_adaptive_lanes with rescue_width=512 —
                  gather wide enough for every straggler, still one
                  compiled program (NEW Mosaic lane width for the
                  net1 kernels: first dispatch detached, NO watchdog)

Usage:  python validation/bench_adaptdev_net1.py   (TPU, detached)
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
from hpfx.solve import (Scenarios, hpf_sweep_adaptive,  # noqa: E402
                        hpf_sweep_device)

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")
B = int(os.environ.get("HPFX_AB_BATCH1", "2048"))
REPS = int(os.environ.get("HPFX_AB_REPS", "3"))


def scen_of(k):
    return Scenarios(
        p_scale=jnp.asarray(np.linspace(0.8, 1.2, B) + 1e-4 * k,
                            jnp.float32),
        q_scale=jnp.asarray(np.linspace(0.8, 1.2, B), jnp.float32),
        injection_scale=jnp.asarray(np.linspace(0.6, 1.4, B), jnp.float32))


def main():
    s = hpfx.settings_for_hmax(25, coupled=True).with_(
        solver="arrow", stable_mismatch=True, big_solve="panel")
    net = hpfx.load_network(os.path.join(DATA, "net1_buses.csv"),
                            os.path.join(DATA, "net1_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    s2 = s.with_(solver="arrow")

    f128 = jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                           phase_iters=24))
    f512 = jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                           phase_iters=24, rescue_width=512))
    # bucketed widths (round 5): lax.switch to the smallest bucket
    # covering the straggler count — the device-only generalization;
    # wrapped in hpf_sweep_device so the deterministic host rescue +
    # f64 knife-edge fallback close whatever the lanes program leaves
    fbkt = jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                           phase_iters=24,
                           rescue_width=(128, 512, 2048)))
    variants = {
        "host_adaptive": lambda sc: hpf_sweep_adaptive(
            net, dev, s, sc, phase_iters=24, phase2_settings=s2),
        "device+rescue": lambda sc: hpf_sweep_device(
            net, dev, s, sc, phase_iters=24, jitted=f128),
        "device_w512": lambda sc: f512(net, dev, scenarios=sc),
        "device_bucketed": lambda sc: hpf_sweep_device(
            net, dev, s, sc, phase_iters=24, jitted=fbkt),
        "device_bucketed_raw": lambda sc: fbkt(net, dev, scenarios=sc),
    }
    for name, fn in variants.items():
        t0 = time.perf_counter()
        np.asarray(fn(scen_of(-1)).V_m)
        print(json.dumps({"variant": name, "event": "warm",
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    for k in range(REPS):
        for name, fn in variants.items():
            sc = scen_of(k)
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
