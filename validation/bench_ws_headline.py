"""Decisive TPU A/B: cold vs exact-linear-warm device-side adaptive
sweep at the DRIVER HEADLINE config (net2 H<=25 B=16384, arrow +
stable_mismatch + panel, phase_iters=24 — bench.py's net2 stage).

Round-4's bench_warmstart.py A/B was confounded two ways: (a) each
``hpf_sweep_device`` call built a fresh ``jax.jit`` wrapper, so every
rep paid a full retrace (~seconds) that swamped the sub-second sweep —
its "colddev 800/s" numbers vs the driver's 24.5k/s; (b) it ran
concurrently with the driver bench on the shared chip (CLAUDE.md #20).
Here both programs are prejitted ONCE and reps interleave in a single
otherwise-idle process, with fresh scenario values per rep and
host-materialized sync (BENCH_NOTES "measurement integrity").

Run DETACHED with no watchdog (the warm B=16384 lanes program is a new
first dispatch; #30/#32 protocol):

    nohup python validation/bench_ws_headline.py > /tmp/ws_headline.log 2>&1 &

Env: HPFX_WSH_BATCH (16384), HPFX_WSH_REPEATS (5), HPFX_WSH_NET (net2).
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

NET = os.environ.get("HPFX_WSH_NET", "net2")
B = int(os.environ.get("HPFX_WSH_BATCH", "16384"))
REPEATS = int(os.environ.get("HPFX_WSH_REPEATS", "5"))
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")

enable_persistent_cache()

s = hpfx.settings_for_hmax(25, coupled=True).with_(
    solver="arrow", stable_mismatch=True, big_solve="panel")
net = hpfx.load_network(os.path.join(DATA, f"{NET}_buses.csv"),
                        os.path.join(DATA, f"{NET}_lines.csv"), s)
dev = hpfx.load_device_set(net, s)

JIT = {
    w: jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                       phase_iters=24, warm=w))
    for w in ("cold", "linear")
}


def scen(k):
    return Scenarios(
        p_scale=jnp.asarray(np.linspace(0.8, 1.2, B) + 1e-4 * k,
                            jnp.float32),
        q_scale=jnp.asarray(np.linspace(0.8, 1.2, B), jnp.float32),
        injection_scale=jnp.asarray(np.linspace(0.6, 1.4, B),
                                    jnp.float32))


def run(w, k):
    sc = scen(k)
    t0 = time.perf_counter()
    out = hpf_sweep_device(net, dev, s, sc, phase_iters=24, jitted=JIT[w])
    conv = np.asarray(out.converged)
    np.asarray(out.V_m)
    it = np.asarray(out.n_iter)
    dt = time.perf_counter() - t0
    return dt, float(conv.mean()), int(conv.sum()), it


for w in ("cold", "linear"):
    t0 = time.perf_counter()
    run(w, 999)
    print(f"{w}: first dispatch {time.perf_counter() - t0:.1f}s", flush=True)

best = {w: (1e30, 0.0, 0, None) for w in JIT}
for k in range(REPEATS):
    for w in ("cold", "linear"):
        dt, conv, nconv, it = run(w, k)
        if dt < best[w][0]:
            best[w] = (dt, conv, nconv, it)
        print(f"  rep{k} {w}: {nconv / dt:.0f}/s conv {conv:.4f} "
              f"trips mean {it.mean():.2f} max {it.max()}", flush=True)

for w, (dt, conv, nconv, it) in best.items():
    print(f"{w}: {nconv / dt:.0f} conv-solves/s at conv {conv:.4f} "
          f"trips mean {it.mean():.2f} max {it.max()} "
          f"(B={B} {NET}, best of {REPEATS})", flush=True)
