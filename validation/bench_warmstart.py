"""TPU A/B for the exact-linear Norton warm start (hpfx.warmstart).

Two interleaved variants of the SAME coupled adaptive sweep (same
scenario draws, fresh values per rep, host-materialized sync —
CLAUDE.md "measurement integrity", #20):

1. ``flat``: the established flat-start adaptive sweep (the bench
   family baseline).
2. ``warm``: ``norton_warm_start`` (batched fundamental PF + one
   (H−1)·n coupled-linear solve per scenario) passed as ``V0`` — the
   seed's cost is INCLUDED in the measured time, so the printed
   throughput is honest end-to-end.

Also prints mean/max NR trip counts so the seed's effect decomposes
into trips saved vs seed cost paid.

Run DETACHED with no watchdog (new XLA programs; #30 protocol):

    nohup python validation/bench_warmstart.py > /tmp/bench_ws.log 2>&1 &

Env: HPFX_WS_NET=net2|net1 (default net2), HPFX_WS_BATCH (4096),
HPFX_WS_REPEATS (3), HPFX_WS_CPU=1 for a CPU trial.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HPFX_WS_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.solve import Scenarios, hpf_sweep_adaptive, hpf_sweep_device
from hpfx.utils.cache import enable_persistent_cache
from hpfx.warmstart import norton_warm_start

NET = os.environ.get("HPFX_WS_NET", "net2")
B = int(os.environ.get("HPFX_WS_BATCH", "4096" if NET == "net2" else "512"))
REPEATS = int(os.environ.get("HPFX_WS_REPEATS", "3"))
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")

enable_persistent_cache()

s = hpfx.settings_for_hmax(25, coupled=True).with_(solver="arrow")
net = hpfx.load_network(os.path.join(DATA, f"{NET}_buses.csv"),
                        os.path.join(DATA, f"{NET}_lines.csv"), s)
dev = hpfx.load_device_set(net, s)


SPREAD = os.environ.get("HPFX_WS_SPREAD", "bench")


def draws(k):
    rd = s.real_dtype
    if SPREAD == "bench":
        # the driver bench's own net2-stage distribution (bench.py
        # spread=(0.8, 1.2, 0.6, 1.4), linspace + per-rep offset) — the
        # headline the A/B is deciding about
        return Scenarios(
            p_scale=jnp.asarray(np.linspace(0.8, 1.2, B) + 1e-4 * k, rd),
            q_scale=jnp.asarray(np.linspace(0.8, 1.2, B), rd),
            injection_scale=jnp.asarray(np.linspace(0.6, 1.4, B), rd))
    rng = np.random.default_rng(1000 + k)     # SPREAD="hard": wide uniform
    return Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.6, 1.4, B), rd),
        q_scale=jnp.asarray(rng.uniform(0.6, 1.4, B), rd),
        injection_scale=jnp.asarray(rng.uniform(0.3, 1.7, B), rd))


def run(name, k):
    scen = draws(k)
    t0 = time.perf_counter()
    if name == "warm":
        V0 = norton_warm_start(net, dev, s, scen)
        out = hpf_sweep_adaptive(net, dev, s, scen, V0=V0)
    elif name == "colddev":
        out = hpf_sweep_device(net, dev, s, scen)
    elif name == "warmdev":
        # the fused variant: seed computed IN-PROGRAM (lanes layout),
        # single dispatch for seed + both phases + rescue
        out = hpf_sweep_device(net, dev, s, scen, warm="linear")
    else:
        out = hpf_sweep_adaptive(net, dev, s, scen)
    conv = np.asarray(out.converged)       # host materialization = sync
    np.asarray(out.V_m)
    it = np.asarray(out.n_iter)
    dt = time.perf_counter() - t0
    return dt, float(conv.mean()), int(conv.sum()), it


VARIANTS = os.environ.get(
    "HPFX_WS_VARIANTS", "flat,warm,colddev,warmdev").split(",")
for name in VARIANTS:
    t0 = time.perf_counter()
    run(name, 999)
    print(f"{name}: first dispatch {time.perf_counter() - t0:.1f}s",
          flush=True)

best = {name: (1e30, 0.0, 0, None) for name in VARIANTS}
for k in range(REPEATS):
    for name in VARIANTS:
        dt, conv, nconv, it = run(name, k)
        if dt < best[name][0]:
            best[name] = (dt, conv, nconv, it)
        print(f"  rep{k} {name}: {nconv / dt:.0f}/s conv {conv:.4f} "
              f"trips mean {it.mean():.2f} max {it.max()}", flush=True)

for name, (dt, conv, nconv, it) in best.items():
    print(f"{name}: {nconv / dt:.0f} conv-solves/s at conv {conv:.4f} "
          f"trips mean {it.mean():.2f} max {it.max()} "
          f"(B={B} {NET}, best of {REPEATS})", flush=True)
