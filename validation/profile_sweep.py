"""jax.profiler trace of one warm net2 device-side adaptive sweep.

Confirms profiling WORKS on this axon relay (round-4; trace lands in
<out>/plugins/profile/<ts>/*.trace.json.gz) and produced the ceiling
decomposition recorded in BENCH_NOTES "round 4 — ceiling note":
device program 0.495 s/sweep at B=16384 (= 33.1k solves/s device-side
ceiling), NR while-loop 90% of it, Pallas GJ solve 9%.

Usage:  python validation/profile_sweep.py [outdir=/tmp/jaxtrace]
NOTE: tracing inflates the traced call's wall (~5x) — never time and
trace in the same rep.
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
from hpfx.utils.cache import enable_persistent_cache

enable_persistent_cache()
from hpfx.lanes import hpf_sweep_adaptive_lanes  # noqa: E402
from hpfx.solve import Scenarios  # noqa: E402
from hpfx.utils.profiling import profile_trace  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"


def main():
    s = hpfx.settings_for_hmax(25, coupled=True).with_(
        solver="arrow", stable_mismatch=True, big_solve="panel")
    net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                            os.path.join(DATA, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    B = 16384
    scen = Scenarios(
        p_scale=jnp.asarray(np.linspace(0.8, 1.2, B), jnp.float32),
        q_scale=jnp.asarray(np.linspace(0.8, 1.2, B), jnp.float32),
        injection_scale=jnp.asarray(np.linspace(0.6, 1.4, B), jnp.float32))
    warm = os.environ.get("HPFX_PROFILE_WARM", "cold")
    f = jax.jit(partial(hpf_sweep_adaptive_lanes, settings=s,
                        phase_iters=24, warm=warm))
    print("warm =", warm)
    np.asarray(f(net, dev, scenarios=scen).V_m)      # warm
    t0 = time.perf_counter()
    with profile_trace(OUT):
        r = f(net, dev, scenarios=scen)
        np.asarray(r.V_m)
    print("traced sweep wall:", round(time.perf_counter() - t0, 2),
          "s (tracing overhead included); trace dir:", OUT)


if __name__ == "__main__":
    main()
