"""TPU timing for the round-4 physical-modeling layers: frequency-
dependent load damping (hpfx.loadmodel) and sequence-aware networks
(hpfx.sequence), both riding hpf_sweep_adaptive through the
(Y, lineY, lineY_f) triple.

Three interleaved variants of the SAME net2 H<=25 coupled sweep (same
scenario draws, fresh values per rep, host-materialized sync — CLAUDE.md
"measurement integrity"):

1. ``plain``: the established adaptive sweep (the bench family) — the
   in-process baseline every comparison is made against (#20: only
   interleaved same-process timings are meaningful).
2. ``damped``: + ``linear_load_admittance`` parallel-RL diagonal via
   ``damped_structures`` (identical program family, Y_diag folded into
   both admittance forms).
3. ``seqaware``: + ``sequence_structures`` (triplens 3/9/15/21 on the
   zero-sequence network, z0 = 2.5R/3X, one grounded neutral).

Run DETACHED with no watchdog (new XLA programs; post-migration first
dispatches are seconds-to-minutes, CLAUDE.md #38, but the #30 protocol
stands):

    nohup python validation/bench_seq.py > /tmp/bench_seq.log 2>&1 &

Stages print one line each: variant, conv fraction, converged-solves/s.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HPFX_SEQ_CPU") == "1":        # CPU trial runs (env var
    jax.config.update("jax_platforms", "cpu")    # alone is overridden by
    jax.config.update("jax_enable_x64", True)    # the axon sitecustomize)

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.solve import Scenarios, hpf_sweep_adaptive
from hpfx.utils.cache import enable_persistent_cache

B = int(os.environ.get("HPFX_SEQ_BATCH", "4096"))
REPEATS = int(os.environ.get("HPFX_SEQ_REPEATS", "3"))
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")

enable_persistent_cache()

s = hpfx.settings_for_hmax(25, coupled=True).with_(solver="arrow")
net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                        os.path.join(DATA, "net2_lines.csv"), s)
dev = hpfx.load_device_set(net, s)

yd = hpfx.linear_load_admittance(net, s, buses=[1, 2])
VARIANTS = {
    "plain": None,
    "damped": hpfx.damped_structures(net, s, yd),
    "seqaware": hpfx.sequence_structures(net, s, r0_scale=2.5,
                                         x0_scale=3.0, bus_Xg={1: 0.1}),
}


def draws(k):
    rng = np.random.default_rng(1000 + k)
    rd = s.real_dtype
    return Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.6, 1.4, B), rd),
        q_scale=jnp.asarray(rng.uniform(0.6, 1.4, B), rd),
        injection_scale=jnp.asarray(rng.uniform(0.3, 1.7, B), rd))


def run(name, Y, k):
    scen = draws(k)
    t0 = time.perf_counter()
    out = hpf_sweep_adaptive(net, dev, s, scen, Y=Y)
    conv = np.asarray(out.converged)       # host materialization = sync
    np.asarray(out.V_m)
    dt = time.perf_counter() - t0
    return dt, float(conv.mean()), int(conv.sum())


for name, Y in VARIANTS.items():
    t0 = time.perf_counter()
    run(name, Y, 999)
    print(f"{name}: first dispatch {time.perf_counter() - t0:.1f}s",
          flush=True)

# interleaved warm reps: round-robin across variants so chip drift (#20)
# hits all three equally
best = {name: (1e30, 0.0, 0) for name in VARIANTS}
for k in range(REPEATS):
    for name, Y in VARIANTS.items():
        dt, conv, nconv = run(name, Y, k)
        if dt < best[name][0]:
            best[name] = (dt, conv, nconv)
        print(f"  rep{k} {name}: {nconv / dt:.0f}/s conv {conv:.4f}",
              flush=True)

for name, (dt, conv, nconv) in best.items():
    print(f"{name}: {nconv / dt:.0f} conv-solves/s at conv {conv:.4f} "
          f"(B={B}, best of {REPEATS})", flush=True)
