"""Benchmark: batched coupled-NR harmonic power flow throughput on TPU.

Measures end-to-end HPF solves/sec (Ybus + fundamental warm start + coupled
harmonic NR to convergence, per scenario) for a vmapped scenario sweep on
net2 at H<=25 — the BASELINE.md headline config.  Baseline target:
10,000 solves/sec on a v5e-8; per chip that is 1,250/s, and vs_baseline is
reported against the per-chip share scaled by the local device count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("HPFX_BENCH_BATCH", "4096"))
REPEATS = int(os.environ.get("HPFX_BENCH_REPEATS", "5"))
TIMEOUT_S = int(os.environ.get("HPFX_BENCH_TIMEOUT", "900"))
TARGET_V5E8 = 10_000.0  # solves/sec on 8 chips (BASELINE.md)


def _watchdog(signum, frame):
    # a wedged TPU runtime must not hang the driver: report and exit
    print(json.dumps({
        "metric": "batched coupled-NR HPF solves/sec (net2, H<=25) — "
                  "TPU runtime unresponsive, benchmark timed out",
        "value": 0.0,
        "unit": "solves/sec",
        "vs_baseline": 0.0,
    }), flush=True)
    os._exit(0)  # driver records the JSON line; nonzero rc could discard it


signal.signal(signal.SIGALRM, _watchdog)
signal.alarm(TIMEOUT_S)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import hpfx  # noqa: E402
from hpfx.solve import Scenarios, hpf_sweep_adaptive  # noqa: E402


def main():
    n_dev = len(jax.devices())
    s = hpfx.settings_for_hmax(25, coupled=True)
    data = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "hpfx", "data")
    net = hpfx.load_network(os.path.join(data, "net2_buses.csv"),
                            os.path.join(data, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)

    # scenario spread representative of a hosting-capacity sweep
    key_p = jnp.linspace(0.8, 1.2, BATCH)
    key_i = jnp.linspace(0.6, 1.4, BATCH)
    scen = Scenarios(p_scale=key_p, q_scale=key_p, injection_scale=key_i)

    # two-phase sweep: stragglers re-solve warm-started instead of
    # holding the whole lockstep batch at max_iter (identical solutions)
    run = lambda: hpf_sweep_adaptive(net, dev, s, scen, phase_iters=24)

    # warmup/compile
    res = run()
    res.V_m.block_until_ready()
    conv = float(jnp.mean(res.converged.astype(jnp.float32)))

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        res = run()
        res.V_m.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    solves_per_sec = BATCH / dt

    per_chip_target = TARGET_V5E8 / 8.0 * n_dev
    signal.alarm(0)
    print(json.dumps({
        "metric": "batched coupled-NR HPF solves/sec (net2, H<=25, "
                  f"B={BATCH}, conv={conv:.3f}, {n_dev} chip(s))",
        "value": round(solves_per_sec, 1),
        "unit": "solves/sec",
        "vs_baseline": round(solves_per_sec / per_chip_target, 3),
    }))


if __name__ == "__main__":
    main()
