"""TPU timing for the distributed-parameter long-line layer
(hpfx.longline) riding hpf_sweep_adaptive through the (Y, lineY,
lineY_f) triple.

net2's shipped lines carry no charging (B = 0), where the correction is
exactly the identity — so this harness first CHARGES the lines (flat B
scaled until the top-order electrical length |θ(h=25)| ≈ 0.8 rad, a
realistic long-EHV-feeder regime where the nominal pi is ~10% wrong per
branch), then times two interleaved variants of the SAME sweep on the
charged network (same draws, fresh values per rep, host-materialized
sync — CLAUDE.md "measurement integrity", #20):

1. ``nominal``: charged net, nominal-pi Ybus (the default assembly).
2. ``longline``: charged net, exact sinh/tanh equivalent-pi triple.

Both are Y-override programs of the same family as the damped/seqaware
timings (BENCH_NOTES round 4) — the correction itself is a one-time
host-side (H, L) elementwise factor, so the expectation is ~free; this
harness is the measurement that claim rests on.

Run DETACHED with no watchdog (new XLA program constants; the #30
protocol stands):

    nohup python validation/bench_longline.py > /tmp/bench_longline.log 2>&1 &
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HPFX_LL_CPU") == "1":         # CPU trial runs (env var
    jax.config.update("jax_platforms", "cpu")    # alone is overridden by
    jax.config.update("jax_enable_x64", True)    # the axon sitecustomize)

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.solve import Scenarios, hpf_sweep_adaptive
from hpfx.utils.cache import enable_persistent_cache

B = int(os.environ.get("HPFX_LL_BATCH", "4096"))
REPEATS = int(os.environ.get("HPFX_LL_REPEATS", "3"))
THETA_TOP = float(os.environ.get("HPFX_LL_THETA", "0.8"))
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")

enable_persistent_cache()

s = hpfx.settings_for_hmax(25, coupled=True).with_(solver="arrow")
net0 = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                         os.path.join(DATA, "net2_lines.csv"), s)
dev = hpfx.load_device_set(net0, s)

# charge the lines: flat B scaled so max |θ(h_top)| = THETA_TOP
probe = dataclasses.replace(
    net0, line_B=jnp.ones_like(net0.line_B) * 1e-3)
th = float(np.asarray(hpfx.electrical_length(probe, s))[-1].max())
b_flat = 1e-3 * (THETA_TOP / th) ** 2
net = dataclasses.replace(net0, line_B=jnp.ones_like(net0.line_B) * b_flat)
th_final = np.asarray(hpfx.electrical_length(net, s))
print(f"charged net2: B={b_flat:.3e} pu, |theta| at h=25: "
      f"{th_final[-1]}", flush=True)

VARIANTS = {
    "nominal": None,
    "longline": hpfx.longline_structures(net, s),
}


def draws(k):
    rng = np.random.default_rng(1000 + k)
    rd = s.real_dtype
    return Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.6, 1.4, B), rd),
        q_scale=jnp.asarray(rng.uniform(0.6, 1.4, B), rd),
        injection_scale=jnp.asarray(rng.uniform(0.3, 1.7, B), rd))


def run(Y, k):
    scen = draws(k)
    t0 = time.perf_counter()
    out = hpf_sweep_adaptive(net, dev, s, scen, Y=Y)
    conv = np.asarray(out.converged)       # host materialization = sync
    vm = np.asarray(out.V_m)
    dt = time.perf_counter() - t0
    thd = np.asarray(hpfx.get_thd(np.moveaxis(vm, 1, 0)).THD_F)  # (B, n)
    worst = float(np.nanmax(thd[conv.astype(bool)])) \
        if conv.any() else float("nan")
    return dt, float(conv.mean()), int(conv.sum()), worst


# construction cost (host-side, one-time)
t0 = time.perf_counter()
hpfx.longline_structures(net, s)
print(f"longline_structures construction: "
      f"{time.perf_counter() - t0:.3f}s", flush=True)

for name, Y in VARIANTS.items():
    t0 = time.perf_counter()
    run(Y, 999)
    print(f"{name}: first dispatch {time.perf_counter() - t0:.1f}s",
          flush=True)

best = {name: (1e30, 0.0, 0, 0.0) for name in VARIANTS}
for k in range(REPEATS):
    for name, Y in VARIANTS.items():
        dt, conv, nconv, worst = run(Y, k)
        if dt < best[name][0]:
            best[name] = (dt, conv, nconv, worst)
        print(f"  rep{k} {name}: {nconv / dt:.0f}/s conv {conv:.4f} "
              f"worstTHD {worst:.4f}", flush=True)

for name, (dt, conv, nconv, worst) in best.items():
    print(f"{name}: {nconv / dt:.0f} conv-solves/s at conv {conv:.4f}, "
          f"worstTHD {worst:.4f} (B={B}, best of {REPEATS})", flush=True)
