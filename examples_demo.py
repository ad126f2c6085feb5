"""End-to-end hpfx demo: every layer of the pipeline in one script.

Run: python examples_demo.py          (CPU or TPU; ~1 min on CPU)

Covers, in order:
  1. device characterization: simulate an SMPS rectifier, fit its coupled
     Norton equivalent (replaces the reference's Simulink + NE_from_sim.py)
  2. harmonic power flow on net2 with the shipped smps table
  3. a batched hosting-capacity sweep with THD screening
  4. THD sensitivity to device penetration (implicit differentiation)
  5. Kron reduction of the passive bus
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import hpfx

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "hpfx", "data")


def main():
    # -- 1. characterize a rectifier and fit its Norton equivalent --------
    from hpfx.simulate import SweepProtocol, characterize_rectifier, smps_params
    proto = SweepProtocol(harm_freqs=(150.0, 250.0, 350.0, 450.0))
    ms = characterize_rectifier(smps_params(), proto)
    fit = hpfx.fit_norton_from_measurements(ms)
    print(f"[1] NE fit: self-test uncoupled={fit.err_uncoupled:.1e} "
          f"coupled={fit.err_coupled:.1e} passed={fit.passed}")

    # -- 2. harmonic power flow on net2 -----------------------------------
    s = hpfx.settings_for_hmax(25, coupled=True)
    net = hpfx.load_network(os.path.join(DATA, "net2_buses.csv"),
                            os.path.join(DATA, "net2_lines.csv"), s)
    dev = hpfx.load_device_set(net, s)
    res = hpfx.hpf(net, dev, s)
    rep = hpfx.report(res, s)
    print(f"[2] net2 H<=25 coupled: {rep.n_iter_harm} NR iterations, "
          f"err={rep.err_harm:.2e}, THD_F per bus="
          f"{np.round(np.asarray(rep.thd.THD_F), 4)}")

    # -- 3. hosting-capacity sweep ----------------------------------------
    B = 512
    rng = np.random.default_rng(0)
    scen = hpfx.Scenarios(
        p_scale=jnp.asarray(rng.uniform(0.9, 1.1, B), s.real_dtype),
        q_scale=jnp.asarray(rng.uniform(0.9, 1.1, B), s.real_dtype),
        injection_scale=jnp.asarray(rng.uniform(0.2, 1.2, B), s.real_dtype))
    summary = hpfx.hosting_capacity_sweep(net, dev, settings=s,
                                          scenarios=scen, thd_limit=0.5)
    print(f"[3] sweep B={B}: conv="
          f"{float(jnp.mean(summary.converged.astype(jnp.float32))):.3f}, "
          f"frac THD>0.5: {float(summary.frac_over_limit):.3f}")

    # -- 4. sensitivity of worst-bus THD to penetration -------------------
    sens = hpfx.injection_sensitivity(net, dev, s, res)
    print(f"[4] d(maxTHD)/d(penetration) at nominal: "
          f"{float(sens.grad):+.4f} (THD={float(sens.value):.4f})")

    # -- 5. Kron-reduce the passive bus -----------------------------------
    red = hpfx.kron_reduce(net, s)
    res_r = hpfx.hpf(red.net, dev, s, Y=red.Y)
    V_m, _ = hpfx.recover_voltages(red, res_r, net.n)
    dthd = np.abs(np.asarray(hpfx.get_thd(V_m).THD_F)
                  - np.asarray(rep.thd.THD_F)).max()
    print(f"[5] Kron-reduced ({net.n}->{red.net.n} buses): THD matches "
          f"full solve to {dthd:.1e}")


if __name__ == "__main__":
    main()
