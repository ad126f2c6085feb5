"""TPU timing for the round-4 study capabilities (hpfx.studies +
hpfx.contingency).

Three stages, each printed as its own line:

1. ``assess``: Monte-Carlo percentile assessment on net2 H<=25 —
   hpf_sweep_adaptive (the bench family's programs) + the nanquantile
   reduction, end to end.  Converged-solves/sec should track the plain
   sweep (the reduction is negligible); this proves it on hardware.
2. ``timeseries``: a week of 10-min values (T=1008) on net2, chunked —
   steps/sec through run_timeseries + percentile_compliance.
3. ``contingency``: the net1 N-1 line screen (23 outages, one vmapped
   full-HPF program, H<=5 uncoupled like the CPU tests) — screens/sec.

Run DETACHED with no watchdog — stages 1/2 ride established kernel
shapes but are new XLA programs; stage 3 is a new program family
(vmapped hpf over line-array stacks) at net1 dims (CLAUDE.md #30/#38):

    nohup python validation/bench_studies.py > /tmp/bench_studies.log 2>&1 &

bench.py discipline: fresh input values per rep, host-materialized sync
(block_until_ready does not synchronize on this relay), min over warm
reps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HPFX_STUDIES_CPU") == "1":    # CPU trial runs (the
    jax.config.update("jax_platforms", "cpu")    # env var alone is
    jax.config.update("jax_enable_x64", True)    # overridden by axon)

import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx.solve import hpf_sweep_adaptive
from hpfx.utils.cache import enable_persistent_cache

B = int(os.environ.get("HPFX_STUDIES_BATCH", "4096"))
T = int(os.environ.get("HPFX_STUDIES_STEPS", "1008"))
CHUNK = int(os.environ.get("HPFX_STUDIES_CHUNK", "1008"))
REPEATS = int(os.environ.get("HPFX_STUDIES_REPEATS", "3"))
STAGES = os.environ.get("HPFX_STUDIES_STAGES", "assess,timeseries,"
                        "contingency").split(",")
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")


def _net(name, hmax, coupled, **kw):
    s = hpfx.settings_for_hmax(hmax, coupled=coupled).with_(**kw)
    net = hpfx.load_network(os.path.join(DATA, f"{name}_buses.csv"),
                            os.path.join(DATA, f"{name}_lines.csv"), s)
    return s, net, hpfx.load_device_set(net, s)


def stage_assess():
    s, net, dev = _net("net2", 25, True, solver="arrow")

    def run(k):
        scen = hpfx.monte_carlo_scenarios(k, B, net, s, inj_spread=0.3)
        t0 = time.perf_counter()
        qa = hpfx.assess_quantiles(net, dev, s, scen,
                                   sweep=hpf_sweep_adaptive)
        np.asarray(qa.thd_q)
        return time.perf_counter() - t0, qa

    t0 = time.perf_counter()
    _, qa = run(999)
    print(f"assess first dispatch: {time.perf_counter() - t0:.1f}s",
          flush=True)
    times, conv = [], 1.0
    for k in range(REPEATS):
        dt, qa = run(k)
        times.append(dt)
        conv = min(conv, qa.converged_frac)
        print(f"  rep {k}: {dt:.3f}s ({B / dt:.0f} assessed-solves/s)",
              flush=True)
    print(f"assess net2 H<=25 B={B}: {B / min(times):.0f} "
          f"assessed-solves/s, conv={conv:.4f}, worst-bus p95 THD "
          f"{float(qa.thd_q[1, qa.worst_bus]):.3f}", flush=True)


def stage_timeseries():
    s, net, dev = _net("net2", 25, True, solver="arrow")
    # the adaptive sweep's straggler rescue closes the knife-edge f32
    # steps the plain sweep leaves (first TPU run: conv 0.9911 plain)
    sweep = hpf_sweep_adaptive if os.environ.get(
        "HPFX_STUDIES_TS_ADAPTIVE", "1") == "1" else None

    def run(k):
        rng = np.random.default_rng(k)
        prof = hpfx.daily_profile(T, base=0.7 + 0.01 * rng.uniform(),
                                  peak=1.15)
        t0 = time.perf_counter()
        ts = hpfx.run_timeseries(net, dev, s, prof, inj_profile=prof,
                                 chunk=CHUNK, sweep=sweep)
        pc = hpfx.percentile_compliance(ts, s)
        np.asarray(pc.thd_p)
        return time.perf_counter() - t0, pc

    t0 = time.perf_counter()
    run(999)
    print(f"timeseries first dispatch: {time.perf_counter() - t0:.1f}s",
          flush=True)
    times, conv = [], 1.0
    for k in range(REPEATS):
        dt, pc = run(k)
        times.append(dt)
        conv = min(conv, pc.converged_frac)
        print(f"  rep {k}: {dt:.3f}s ({T / dt:.0f} steps/s)", flush=True)
    print(f"timeseries net2 H<=25 T={T} chunk={CHUNK}: "
          f"{T / min(times):.0f} steps/s, conv={conv:.4f}", flush=True)


def stage_contingency():
    s, net, dev = _net("net1", 5, False)
    base = hpfx.hpf(net, dev, s)
    np.asarray(base.V_m)

    def run():
        t0 = time.perf_counter()
        rep = hpfx.screen_line_outages(net, dev, s, base=base)
        return time.perf_counter() - t0, rep

    t0 = time.perf_counter()
    _, rep = run()
    print(f"contingency first dispatch: {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for k in range(REPEATS):
        dt, rep = run()
        times.append(dt)
        print(f"  rep {k}: {dt:.3f}s "
              f"({len(rep.outages) / dt:.1f} outages/s)", flush=True)
    conv = float(np.mean(rep.converged[~rep.islanded]))
    print(f"contingency net1 H<=5 uncoupled, {len(rep.outages)} outages: "
          f"{len(rep.outages) / min(times):.1f} outages/s, "
          f"conv={conv:.4f}, worst delta "
          f"{float(np.nanmax(rep.delta_thd)):+.4f}", flush=True)


def main():
    enable_persistent_cache()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for name in STAGES:
        {"assess": stage_assess, "timeseries": stage_timeseries,
         "contingency": stage_contingency}[name.strip()]()


if __name__ == "__main__":
    main()
