"""TPU timing for the round-4 analysis layers: resonance mode analysis
(hpfx.modes) and unbalanced three-phase penetration (hpfx.threephase).

Both are pure-XLA batched-solve programs (no Pallas), so they ride the
MXU LU path directly:

1. ``modal``: dense-grid modal_scan (K fractional orders, operational
   Norton fold) on net1 and a synthetic n=64 feeder — each grid point
   is ~``iters + 2·refine + 1`` split-complex block solves of the
   slack-reduced Y.  Metric: modes/s (grid points per second).
2. ``abc``: vmapped solve_unbalanced over B random per-phase
   magnitude/angle draws (the stochastic phase-allocation study) on
   net1 H<=13 — each draw is one (H, 3(n-1)) batched block solve.
   Metric: draws/s.

Measurement discipline per CLAUDE.md (#20: interleaved same-process
reps only; host-materialized sync; fresh values per rep).  Batched-LU
shape caution (#10): batch sizes are multiples of 128.

Run DETACHED with no watchdog (new XLA program family; #30 protocol):

    nohup python validation/bench_modes3p.py > /tmp/bench_modes3p.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HPFX_M3P_CPU") == "1":        # CPU trial (env var alone
    jax.config.update("jax_platforms", "cpu")    # is overridden by the
    jax.config.update("jax_enable_x64", True)    # axon sitecustomize)

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.utils.cache import enable_persistent_cache

B = int(os.environ.get("HPFX_M3P_BATCH", "1024"))
K = int(os.environ.get("HPFX_M3P_GRID", "128"))
REPEATS = int(os.environ.get("HPFX_M3P_REPEATS", "3"))
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")

enable_persistent_cache()
print("backend:", jax.default_backend(), flush=True)

s13 = hpfx.settings_for_hmax(13, coupled=False)
s25 = hpfx.settings_for_hmax(25, coupled=True)
net1 = hpfx.load_network(os.path.join(DATA, "net1_buses.csv"),
                         os.path.join(DATA, "net1_lines.csv"), s25)
dev1_25 = hpfx.load_device_set(net1, s25)
net1_13 = hpfx.load_network(os.path.join(DATA, "net1_buses.csv"),
                            os.path.join(DATA, "net1_lines.csv"), s13)
dev1_13 = hpfx.load_device_set(net1_13, s13)

from hpfx.generators import synthetic_feeder  # noqa: E402
s_syn = hpfx.settings_for_hmax(25, coupled=True)
net64 = synthetic_feeder(64, 7, s_syn, components=("SMPS",), seed=1)
dev64 = hpfx.load_device_set(net64, s_syn)

GRID = tuple(np.round(np.linspace(2.0, 25.0, K), 6))


@jax.jit
def modal_net1():
    return hpfx.modal_scan(net1, s25, h_grid=GRID, devices=dev1_25,
                           iters=16)


@jax.jit
def modal_n64():
    return hpfx.modal_scan(net64, s_syn, h_grid=GRID, devices=dev64,
                           iters=16)


def _abc_one(mag, ang):
    return hpfx.solve_unbalanced(net1_13, dev1_13, s13, r0_scale=2.5,
                                 x0_scale=3.0, mag=mag, ang=ang).V


_abc_batch = jax.jit(jax.vmap(_abc_one))


def abc_draws(k):
    rng = np.random.default_rng(2000 + k)
    rd = s13.real_dtype
    n_nl = dev1_13.n_devices
    mag = jnp.asarray(1.0 + 0.3 * rng.standard_normal((B, n_nl, 3)), rd)
    ang = jnp.asarray(0.2 * rng.standard_normal((B, n_nl, 3)), rd)
    return mag, ang


def run_modal(fn, label):
    t0 = time.perf_counter()
    scan = fn()
    res = np.asarray(scan.residual)        # host materialization = sync
    np.asarray(scan.z_modal)
    dt = time.perf_counter() - t0
    return dt, float(np.median(res))


def run_abc(k):
    mag, ang = abc_draws(k)
    t0 = time.perf_counter()
    V = _abc_batch(mag, ang)
    v = np.asarray(V.re)                   # host materialization = sync
    dt = time.perf_counter() - t0
    assert np.isfinite(v).all()
    return dt


STAGES = {"modal_net1": lambda k: run_modal(modal_net1, "net1")[0],
          "modal_n64": lambda k: run_modal(modal_n64, "n64")[0],
          "abc_net1": run_abc}

for name in STAGES:
    t0 = time.perf_counter()
    STAGES[name](999)
    print(f"{name}: first dispatch {time.perf_counter() - t0:.1f}s",
          flush=True)

best = {name: 1e30 for name in STAGES}
for k in range(REPEATS):
    for name, fn in STAGES.items():
        dt = fn(k)
        best[name] = min(best[name], dt)
        unit = K if name.startswith("modal") else B
        print(f"  rep{k} {name}: {unit / dt:.1f}/s ({dt * 1e3:.1f} ms)",
              flush=True)

_, med1 = run_modal(modal_net1, "net1")
_, med64 = run_modal(modal_n64, "n64")
print(f"modal_net1: {K / best['modal_net1']:.1f} modes/s "
      f"(K={K}, median residual {med1:.1e})", flush=True)
print(f"modal_n64: {K / best['modal_n64']:.1f} modes/s "
      f"(K={K}, median residual {med64:.1e})", flush=True)
print(f"abc_net1: {B / best['abc_net1']:.1f} draws/s (B={B}, H<=13)",
      flush=True)
