"""TPU timing for batched background-distortion studies (hpfx.background).

A Monte-Carlo background study: B scenarios differing only in the
upstream grid spectrum (random magnitudes/angles at the odd low orders),
solved as one jitted vmap of ``hpfx.harmonic.hpf`` over the ``I_bg``
pytree argument — the recipe docs/guide.md §5 prescribes.  Measures
converged-solves/sec with the bench.py discipline: fresh input values
per rep, host-materialized sync (block_until_ready does not synchronize
on this relay), warm reps only (min over reps).

Run DETACHED with no watchdog — the first dispatch of this program is a
new compile/execute window (CLAUDE.md #30/#38):

    nohup python validation/bench_background.py > /tmp/bench_bg.log 2>&1 &

Pallas kernel shapes match the established net2 sweep family (arrow
solver, dims <= 184, lane-parallel batch), so no new kernel-shape risk —
only a new XLA program.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx import cx
from hpfx.harmonic import hpf
from hpfx.utils.cache import enable_persistent_cache

B = int(os.environ.get("HPFX_BG_BATCH", "4096"))
REPEATS = int(os.environ.get("HPFX_BG_REPEATS", "3"))
DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hpfx", "data")


def main():
    enable_persistent_cache()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    s = hpfx.settings_for_hmax(25, coupled=True).with_(
        solver="arrow", stable_mismatch=True)
    net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                            os.path.join(DATA, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    H, n = s.n_harmonics, net.n
    rd = s.real_dtype
    orders = np.asarray(s.harmonics, float)            # (H,), orders[0]=1
    x_sh = float(np.asarray(net.bus_Xsh)[0])

    def draws(k: int):
        """(B, H, n) split-complex Norton batch: random upstream Thevenin
        magnitudes up to 3%/2%/1% at h=5/7/11+, random angles, converted
        through Y_sh = 1/(j*X_sh*h) — the grid_source law, vectorized."""
        rng = np.random.default_rng(1000 + k)
        caps = np.where(orders == 5, 0.03,
                        np.where(orders == 7, 0.02, 0.01))
        mag = rng.uniform(0.0, 1.0, (B, H)) * caps
        ang = rng.uniform(0.0, 2 * np.pi, (B, H))
        v = mag * np.exp(1j * ang)
        i = v / (1j * x_sh * orders)                  # Thevenin -> Norton
        i[:, 0] = 0.0                                 # fundamental stays 0
        full = np.zeros((B, H, n), complex)
        full[:, :, 0] = i                             # at the slack bus
        return cx.Cx(jnp.asarray(full.real, rd), jnp.asarray(full.imag, rd))

    # round 5: the study rides hpfx.background_sweep — the adaptive
    # schedule + deterministic rescue (self-warm, cold restart, f64
    # knife-edge fallback), so conv records 1.000 instead of the
    # round-4 vmapped-hpf 0.963 (VERDICT round-4 item 3).  Set
    # HPFX_BG_PLAIN=1 for the old single-program vmapped hpf.
    if os.environ.get("HPFX_BG_PLAIN") == "1":
        _plain = jax.jit(jax.vmap(lambda ibg: hpf(net, dev, s, I_bg=ibg)))
        solve = lambda ibg: _plain(ibg)
        label = "plain-vmap"
    else:
        # schedule="auto" rides the single-program lane-major device
        # path on TPU; warm="linear" folds I_bg into the in-program
        # exact-linear seed (round 5)
        warm = os.environ.get("HPFX_BG_WARM", "linear")
        solve = lambda ibg: hpfx.background_sweep(net, dev, s, ibg,
                                                  phase_iters=16,
                                                  warm=warm)
        label = f"background_sweep[{warm}]"

    t0 = time.perf_counter()
    res = solve(draws(-1))                            # first dispatch
    np.asarray(res.V_m)
    print(f"first dispatch: {time.perf_counter() - t0:.1f}s", flush=True)
    conv = float(np.mean(np.asarray(res.converged)))
    times = []
    for k in range(REPEATS):
        ibg = draws(k)
        t0 = time.perf_counter()
        r = solve(ibg)
        np.asarray(r.V_m)
        times.append(time.perf_counter() - t0)
        conv = min(conv, float(np.mean(np.asarray(r.converged))))
        print(f"rep {k}: {times[-1]:.3f}s "
              f"({B / times[-1]:.0f} solves/s)", flush=True)
    print(f"background study [{label}] net2 H<=25 B={B}: "
          f"{B / min(times):.0f} solves/s, conv={conv:.4f}", flush=True)


if __name__ == "__main__":
    main()
