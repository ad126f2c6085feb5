"""Interleaved same-process A/B: sequential sweeps vs the pipelined stream.

The round-4 ceiling note (BENCH_NOTES) decomposed the device-side
adaptive sweep into 0.495 s of device time inside a 0.65-0.88 s wall —
74-76% occupancy, the rest being host scenario build/upload, dispatch,
and result download paid SERIALLY between sweeps.  `hpf_sweep_stream`
(hpfx/solve.py) keeps `depth` sweeps in flight so that host work rides
under the previous batch's device compute.  This harness measures the
steady-state throughput of a stream of N batches against N sequential
`hpf_sweep_device` calls — same compiled program, same scenarios, honest
host-materialized timing (the stream materializes every result before
yielding), interleaved in one process (CLAUDE.md #20).

Usage:  python validation/bench_stream.py            (TPU, net2 B=16384)
        HPFX_AB_BATCH=4096 HPFX_AB_NBATCH=8 ...      (overrides)
"""
import json
import os
import signal
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMEOUT_S = int(os.environ.get("HPFX_AB_TIMEOUT", "2400"))


def _watchdog(signum, frame):
    print(json.dumps({"error": "TPU unresponsive, A/B timed out"}),
          flush=True)
    os._exit(0)


signal.signal(signal.SIGALRM, _watchdog)
signal.alarm(TIMEOUT_S)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import hpfx  # noqa: E402
from hpfx.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
from hpfx.lanes import hpf_sweep_adaptive_lanes  # noqa: E402
from hpfx.solve import (Scenarios, hpf_sweep_device,  # noqa: E402
                        hpf_sweep_stream)

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")

BATCH = int(os.environ.get("HPFX_AB_BATCH", "16384"))
NBATCH = int(os.environ.get("HPFX_AB_NBATCH", "4"))
REPS = int(os.environ.get("HPFX_AB_REPS", "4"))
PHASE_ITERS = 24


def scen_of(k):
    # distinct scenario set per batch, bench-identical spread; the numpy
    # work happens inside the generator on purpose — that is exactly the
    # host cost the pipeline is supposed to hide
    return Scenarios(
        p_scale=jnp.asarray(np.linspace(0.8, 1.2, BATCH) + 1e-4 * k,
                            jnp.float32),
        q_scale=jnp.asarray(np.linspace(0.8, 1.2, BATCH), jnp.float32),
        injection_scale=jnp.asarray(np.linspace(0.6, 1.4, BATCH),
                                    jnp.float32))


def main():
    s = hpfx.settings_for_hmax(25, coupled=True).with_(
        solver="arrow", stable_mismatch=True, big_solve="panel")
    net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                            os.path.join(DATA, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    jitted = jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                             phase_iters=PHASE_ITERS))

    def run_seq(k0):
        conv = 1.0
        for i in range(NBATCH):
            r = hpf_sweep_device(net, dev, s, scen_of(k0 + i),
                                 phase_iters=PHASE_ITERS, jitted=jitted)
            np.asarray(r.V_m)
            conv = min(conv, float(np.mean(np.asarray(r.converged))))
        return conv

    def run_stream(k0, depth):
        conv = 1.0
        gen = (scen_of(k0 + i) for i in range(NBATCH))
        for r in hpf_sweep_stream(net, dev, s, gen, depth=depth,
                                  phase_iters=PHASE_ITERS, jitted=jitted):
            conv = min(conv, float(np.mean(np.asarray(r.converged))))
        return conv

    variants = {
        "sequential": lambda k0: run_seq(k0),
        "stream_d2": lambda k0: run_stream(k0, 2),
        "stream_d3": lambda k0: run_stream(k0, 3),
    }
    # warm (compile + first-dispatch) before any timing
    for name, fn in variants.items():
        fn(-100)
    for rep in range(REPS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            conv = fn(1000 * rep)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "variant": name, "rep": rep, "wall_s": round(dt, 3),
                "solves_per_sec": round(NBATCH * BATCH / dt, 1),
                "conv": round(conv, 5), "batch": BATCH,
                "n_batches": NBATCH}), flush=True)


if __name__ == "__main__":
    main()
