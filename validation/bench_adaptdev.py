"""Interleaved same-process A/B: host-driven vs single-program adaptive.

CLAUDE.md #20: only same-process interleaved comparisons are meaningful
on the shared chip.  Alternates the host-driven two-phase adaptive sweep
(`hpfx.solve.hpf_sweep_adaptive` — two dispatches + a host round-trip on
the convergence mask between phases) with the single compiled program
(`hpfx.lanes.hpf_sweep_adaptive_lanes`) at the bench configs, honest
host-materialized timing, one JSON line per (config, variant, rep).
This quantifies the dispatch/round-trip floor the host schedule pays —
the round-3 VERDICT's "one more structural lever" measurement.

Usage:  python validation/bench_adaptdev.py                 (TPU)
        HPFX_AB_NET1=0 python validation/bench_adaptdev.py  (net2 only)
"""
import json
import os
import signal
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMEOUT_S = int(os.environ.get("HPFX_AB_TIMEOUT", "1500"))


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

enable_persistent_cache()  # compile-once across processes
from hpfx.lanes import hpf_sweep_adaptive_lanes  # noqa: E402
from hpfx.solve import Scenarios, hpf_sweep_adaptive  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")


def setup(net_name, h_max):
    s = hpfx.settings_for_hmax(h_max, coupled=True).with_(
        solver="arrow", stable_mismatch=True, big_solve="panel")
    net = hpfx.load_network(os.path.join(DATA, f"{net_name}_buses.csv"),
                            os.path.join(DATA, f"{net_name}_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    return s, net, dev


def scen_of(batch, k):
    return Scenarios(
        p_scale=jnp.asarray(np.linspace(0.8, 1.2, batch) + 1e-4 * k,
                            jnp.float32),
        q_scale=jnp.asarray(np.linspace(0.8, 1.2, batch), jnp.float32),
        injection_scale=jnp.asarray(np.linspace(0.6, 1.4, batch),
                                    jnp.float32))


def run_ab(net_name, h_max, batch, phase2_solver, reps=4):
    s, net, dev = setup(net_name, h_max)
    s2 = s.with_(solver=phase2_solver)
    adaptdev = jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                               phase_iters=24))
    variants = {
        "host_adaptive": lambda sc: hpf_sweep_adaptive(
            net, dev, s, sc, phase_iters=24, phase2_settings=s2),
        "adaptdev": lambda sc: adaptdev(net, dev, scenarios=sc),
    }
    # warm every variant (compile) before any timing
    for name, fn in variants.items():
        np.asarray(fn(scen_of(batch, -1)).V_m)
    for k in range(reps):
        for name, fn in variants.items():
            sc = scen_of(batch, k)
            t0 = time.perf_counter()
            r = fn(sc)
            np.asarray(r.V_m)          # host materialization = sync
            dt = time.perf_counter() - t0
            conv = float(np.mean(np.asarray(r.converged)))
            print(json.dumps({
                "config": f"{net_name}_h{h_max}_B{batch}",
                "variant": name, "rep": k,
                "conv": round(conv, 4),
                "mean_iters": round(float(np.mean(np.asarray(r.n_iter))), 2),
                "solves_per_sec": round(conv * batch / dt, 1),
                "wall_s": round(dt, 3),
            }), flush=True)


def main():
    run_ab("net2", 25, int(os.environ.get("HPFX_AB_BATCH2", "16384")),
           phase2_solver="dense")
    if os.environ.get("HPFX_AB_NET1", "1") == "1":
        run_ab("net1", 25, int(os.environ.get("HPFX_AB_BATCH1", "2048")),
               phase2_solver="arrow", reps=2)
    signal.alarm(0)


if __name__ == "__main__":
    main()
