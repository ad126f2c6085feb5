"""TPU timing for analytic converter devices (hpfx.converters) riding
hpf_sweep_adaptive, against the NE-table devices on the same network.

Two interleaved variants of the SAME net2 H<=25 sweep (same draws,
fresh values per rep, host-materialized sync — CLAUDE.md "measurement
integrity", #20):

1. ``ne``:        the shipped coupled SMPS Norton tables (the bench
                  family baseline, in-process).
2. ``converter``: uncoupled six-pulse closed-form devices + the exact
                  linear warm start broadcast over the batch (stiff
                  current sources NaN from the flat start, #40).

The uncoupled device model skips the (H, H) coupling einsum in every
mismatch/Jacobian evaluation, so the expectation is converter >= ne
throughput; this harness is the number that claim rests on.

Run DETACHED with no watchdog (#30):

    nohup python validation/bench_converters.py > /tmp/bench_conv.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HPFX_CONV_CPU") == "1":       # CPU trial runs
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.solve import Scenarios, hpf_sweep_adaptive
from hpfx.utils.cache import enable_persistent_cache

B = int(os.environ.get("HPFX_CONV_BATCH", "4096"))
REPEATS = int(os.environ.get("HPFX_CONV_REPEATS", "3"))
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")

enable_persistent_cache()

s = hpfx.settings_for_hmax(25, coupled=True).with_(solver="arrow")
net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                        os.path.join(DATA, "net2_lines.csv"), s)
dev_ne = hpfx.load_device_set(net, s)
dev_cv = hpfx.converter_device_set(
    net, s, [{"kind": "six_pulse", "I1": 0.3,
              "alpha": np.deg2rad(20.0),
              "mu": np.deg2rad(10.0)}] * net.n_nonlinear)
v0 = hpfx.converter_warm_start(net, s, dev_cv)
V0_b = (jnp.broadcast_to(v0[0], (B,) + v0[0].shape),
        jnp.broadcast_to(v0[1], (B,) + v0[1].shape))

VARIANTS = {
    "ne": (dev_ne, None),
    "converter": (dev_cv, V0_b),
}


def draws(k):
    rng = np.random.default_rng(1000 + k)
    rd = s.real_dtype
    return Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.6, 1.4, B), rd),
        q_scale=jnp.asarray(rng.uniform(0.6, 1.4, B), rd),
        injection_scale=jnp.asarray(rng.uniform(0.3, 1.7, B), rd))


def run(dev, V0, k):
    scen = draws(k)
    t0 = time.perf_counter()
    out = hpf_sweep_adaptive(net, dev, s, scen, V0=V0)
    conv = np.asarray(out.converged)
    np.asarray(out.V_m)
    dt = time.perf_counter() - t0
    return dt, float(conv.mean()), int(conv.sum())


for name, (dev, V0) in VARIANTS.items():
    t0 = time.perf_counter()
    run(dev, V0, 999)
    print(f"{name}: first dispatch {time.perf_counter() - t0:.1f}s",
          flush=True)

best = {name: (1e30, 0.0, 0) for name in VARIANTS}
for k in range(REPEATS):
    for name, (dev, V0) in VARIANTS.items():
        dt, conv, nconv = run(dev, V0, k)
        if dt < best[name][0]:
            best[name] = (dt, conv, nconv)
        print(f"  rep{k} {name}: {nconv / dt:.0f}/s conv {conv:.4f}",
              flush=True)

for name, (dt, conv, nconv) in best.items():
    print(f"{name}: {nconv / dt:.0f} conv-solves/s at conv {conv:.4f} "
          f"(B={B}, best of {REPEATS})", flush=True)
