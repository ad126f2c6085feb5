"""Batch-size scaling of the WARM device-side adaptive sweep.

Round 3 fixed B=16384 as the saturation point of the dispatch-bound
cold sweep (4096 -> 12-16k/s, 16384 -> 20-22k/s, 32768+ flat).  The
round-5 exact-linear warm start cut trips 14.1 -> 2.65, so the program
is ~3x shorter and fixed per-sweep costs (dispatch, H2D, seed solve)
weigh ~3x more — the saturation point may have moved up.  Interleaved
A/B over B in HPFX_BS_BATCHES (default 16384,32768,65536), warm
programs, fresh values per rep, host-materialized sync.

Run DETACHED with no watchdog (B=32768/65536 are new first dispatches):

    nohup python validation/bench_batch_scaling.py > /tmp/bs.log 2>&1 &
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.lanes import hpf_sweep_adaptive_lanes
from hpfx.solve import Scenarios, hpf_sweep_device
from hpfx.utils.cache import enable_persistent_cache

enable_persistent_cache()

BATCHES = [int(b) for b in os.environ.get(
    "HPFX_BS_BATCHES", "16384,32768,65536").split(",")]
REPEATS = int(os.environ.get("HPFX_BS_REPEATS", "3"))
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")

s = hpfx.settings_for_hmax(25, coupled=True).with_(
    solver="arrow", stable_mismatch=True, big_solve="panel")
net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                        os.path.join(DATA, "net2_lines.csv"), s)
dev = hpfx.load_device_set(net, s)

JIT = {B: jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                          phase_iters=24, warm="linear"))
       for B in BATCHES}


def run(B, k):
    sc = Scenarios(
        p_scale=jnp.asarray(np.linspace(0.8, 1.2, B) + 1e-4 * k,
                            jnp.float32),
        q_scale=jnp.asarray(np.linspace(0.8, 1.2, B), jnp.float32),
        injection_scale=jnp.asarray(np.linspace(0.6, 1.4, B),
                                    jnp.float32))
    t0 = time.perf_counter()
    out = hpf_sweep_device(net, dev, s, sc, phase_iters=24, jitted=JIT[B])
    conv = np.asarray(out.converged)
    np.asarray(out.V_m)
    dt = time.perf_counter() - t0
    return dt, float(conv.mean()), int(conv.sum())


for B in BATCHES:
    t0 = time.perf_counter()
    run(B, 999)
    print(f"B={B}: first dispatch {time.perf_counter() - t0:.1f}s",
          flush=True)

best = {B: (1e30, 0.0, 0) for B in BATCHES}
for k in range(REPEATS):
    for B in BATCHES:
        dt, conv, nconv = run(B, k)
        if dt < best[B][0]:
            best[B] = (dt, conv, nconv)
        print(f"  rep{k} B={B}: {nconv / dt:.0f}/s conv {conv:.4f}",
              flush=True)

for B, (dt, conv, nconv) in best.items():
    print(f"B={B}: {nconv / dt:.0f} conv-solves/s at conv {conv:.4f} "
          f"(best of {REPEATS})", flush=True)
