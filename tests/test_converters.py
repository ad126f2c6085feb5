"""Analytic converter spectra (hpfx/converters.py).

The closed forms are gated by an INDEPENDENT time-domain oracle: the
±Id 120°-conduction block with causal linear commutation ramps is
synthesized on a dense grid and FFT'd; the module's phasors must match.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import hpfx
from conftest import make_setup
from hpfx.network import NONLINEAR, PQ, SLACK


def _square6(theta):
    """Ideal 6-pulse block in the cosine frame: +1 on (-π/3, π/3),
    -1 on (2π/3, 4π/3), 0 elsewhere (mod 2π)."""
    th = np.mod(theta + np.pi / 3.0, 2.0 * np.pi)        # shift to [0,..)
    pos = th < 2.0 * np.pi / 3.0
    neg = (th >= np.pi) & (th < 5.0 * np.pi / 3.0)
    return np.where(pos, 1.0, 0.0) - np.where(neg, 1.0, 0.0)


def _fft_oracle(harmonics, alpha, mu, n=1 << 16, shifts=512):
    """Phasors of the delayed, ramp-commutated block by brute force."""
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    if mu > 0:
        s = (np.arange(shifts) + 0.5) / shifts * mu
        wave = _square6(theta[None, :] - alpha - s[:, None]).mean(axis=0)
    else:
        wave = _square6(theta - alpha)
    # phasor convention: x(θ) = Re(X e^{jθ}) -> X_h = (2/N) Σ x e^{-jhθ}
    return (2.0 / n) * np.exp(
        -1j * np.outer(np.asarray(harmonics, float), theta)) @ wave


@pytest.mark.parametrize("alpha,mu", [(0.0, 0.0),
                                      (np.deg2rad(25.0), 0.0),
                                      (0.0, np.deg2rad(12.0)),
                                      (np.deg2rad(30.0),
                                       np.deg2rad(20.0))])
def test_six_pulse_matches_fft_oracle(alpha, mu):
    hs = (1, 3, 5, 7, 9, 11, 13, 17, 19, 23, 25)
    spec = hpfx.six_pulse_spectrum(hs, I1=1.0, alpha=alpha, mu=mu)
    oracle = _fft_oracle(hs, alpha, mu)
    # normalize the oracle's fundamental to 1 like the module does
    oracle = oracle / np.abs(oracle[0])
    np.testing.assert_allclose(spec, oracle, atol=3e-3)
    # structure: no triplens, 1/h law, fundamental lags by alpha + mu/2
    assert np.abs(spec[[1, 4]]).max() < 1e-12            # h=3, 9
    char = np.array([2, 3, 5, 6, 7, 8])                  # 5,7,11,13,17,19
    if mu == 0.0:
        np.testing.assert_allclose(np.abs(spec[char]),
                                   1.0 / np.array([5, 7, 11, 13, 17, 19]),
                                   rtol=1e-12)
    assert np.angle(spec[0]) == pytest.approx(-(alpha + mu / 2.0),
                                              abs=1e-12)


def test_overlap_attenuates_high_orders():
    hs = tuple(range(1, 50, 2))
    flat = np.abs(hpfx.six_pulse_spectrum(hs, mu=0.0))
    soft = np.abs(hpfx.six_pulse_spectrum(hs, mu=np.deg2rad(20.0)))
    char = flat > 0
    ratio = soft[char] / flat[char]
    assert ratio[0] == pytest.approx(1.0, abs=1e-12)     # fundamental kept
    assert ratio[-1] < 0.35                              # h=49 strongly cut
    assert (np.diff(ratio) < 1e-9).all() or ratio[-1] < ratio[1]


def test_twelve_pulse_cancellation():
    hs = (1, 5, 7, 11, 13, 17, 19, 23, 25)
    s6 = hpfx.six_pulse_spectrum(hs)
    s12 = hpfx.twelve_pulse_spectrum(hs)
    # the non-characteristic pairs vanish
    np.testing.assert_allclose(np.abs(s12[[1, 2, 5, 6]]), 0.0, atol=1e-15)
    # the surviving pairs keep the 6-pulse value (total I1 normalized)
    np.testing.assert_allclose(s12[[0, 3, 4, 7, 8]], s6[[0, 3, 4, 7, 8]],
                               rtol=1e-12)
    # independent check: explicit Y-path + Δ-path composition
    h = np.asarray(hs, float)
    composed = s6 * (1.0 + (2 / np.sqrt(3)) * np.cos(h * np.pi / 6.0)) / 2
    np.testing.assert_allclose(s12, composed, rtol=1e-12, atol=1e-15)


def test_table_spectrum():
    hs = (1, 3, 5, 7, 9)
    tab = {5: (20.0, -30.0), 7: (14.0, 100.0), 49: (1.0, 0.0)}
    spec = hpfx.table_spectrum(hs, tab, I1=2.0)
    assert spec[0] == pytest.approx(2.0)                 # implied fund.
    assert np.abs(spec[2]) == pytest.approx(0.4)         # 20% of 2.0
    assert np.angle(spec[2]) == pytest.approx(np.deg2rad(-30.0))
    assert np.abs(spec[3]) == pytest.approx(0.28)
    assert spec[1] == 0 and spec[4] == 0                 # absent orders
    with pytest.raises(ValueError, match="fundamental as 100"):
        hpfx.table_spectrum(hs, {1: (50.0, 0.0), 5: (20.0, 0.0)})
    raw = hpfx.table_spectrum(hs, {1: (0.9, -10.0), 5: (0.2, 0.0)},
                              percent=False)
    assert np.abs(raw[0]) == pytest.approx(0.9)


def _three_bus(s):
    return hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("generator", "lin_load", "drive"),
        P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2],
        R=[0.5, 1.0], X=[2.0, 4.0],
        settings=s, per_unit=False)


def test_injection_sign_convention():
    """Positive-real fundamental I_N = a load: bus voltage dips and the
    bus imports power (the convention the module docstring documents)."""
    s = hpfx.settings_for_hmax(5, coupled=False)
    net = _three_bus(s)
    dev = hpfx.converter_device_set(
        net, s, [hpfx.six_pulse_spectrum(s.harmonics, I1=0.05)])
    res = hpfx.hpf(net, dev, s, V0=hpfx.converter_warm_start(net, s, dev))
    assert bool(res.converged)
    assert float(res.V_m[0, 2]) < 1.0
    fl = hpfx.line_flows(net, s, res.V_m, res.V_a)
    assert float(fl.P_t[0, 1]) < -0.02   # bus 2 imports >0.02 pu at h=1


def test_six_pulse_end_to_end():
    s = hpfx.settings_for_hmax(25, coupled=False)
    net = _three_bus(s)
    dev = hpfx.converter_device_set(
        net, s, [{"kind": "six_pulse", "I1": 0.3,
                  "alpha": np.deg2rad(20.0), "mu": np.deg2rad(10.0)}])
    res = hpfx.hpf(net, dev, s, V0=hpfx.converter_warm_start(net, s, dev))
    assert bool(res.converged)
    hs = np.asarray(s.harmonics)
    Vh = np.asarray(res.V_m[1:, 2])
    char = (np.mod(hs[1:], 6) == 1) | (np.mod(hs[1:], 6) == 5)
    # characteristic orders dominate; non-characteristic at leak level
    assert Vh[char].min() > 30 * Vh[~char].max()
    thd = float(hpfx.get_thd(res.V_m).THD_F[2])
    assert 0.005 < thd < 0.5
    # 12-pulse on the same bus: markedly cleaner
    dev12 = hpfx.converter_device_set(
        net, s, [{"kind": "twelve_pulse", "I1": 0.3,
                  "alpha": np.deg2rad(20.0), "mu": np.deg2rad(10.0)}])
    res12 = hpfx.hpf(net, dev12, s,
                     V0=hpfx.converter_warm_start(net, s, dev12))
    assert bool(res12.converged)
    thd12 = float(hpfx.get_thd(res12.V_m).THD_F[2])
    # half the characteristic orders survive; V_h ≈ |Z_h|·I1/h is ~flat
    # per order on an inductive feeder, so THD drops by ~sqrt(1/2)
    assert thd12 < 0.8 * thd


def test_device_set_on_shipped_network():
    """Converter devices slot into a shipped multi-device net: every
    nonlinear bus gets an entry, sweeps ride unchanged."""
    s, net, _ = make_setup(("net2", 25, False))
    entries = [{"kind": "six_pulse", "I1": 0.1}] * net.n_nonlinear
    dev = hpfx.converter_device_set(net, s, entries)
    assert dev.n_devices == net.n_nonlinear and not dev.coupled
    V0 = hpfx.converter_warm_start(net, s, dev)
    res = hpfx.hpf(net, dev, s, V0=V0)
    assert bool(res.converged)
    B = 8
    scen = hpfx.solve.Scenarios(p_scale=jnp.linspace(0.9, 1.1, B),
                                injection_scale=jnp.linspace(0.5, 1.5, B))
    V0b = (jnp.broadcast_to(V0[0], (B,) + V0[0].shape),
           jnp.broadcast_to(V0[1], (B,) + V0[1].shape))
    sw = hpfx.solve.hpf_sweep(net, dev, s, scen, V0=V0b)
    assert float(np.asarray(sw.converged).mean()) == 1.0
    with pytest.raises(ValueError, match="one entry per nonlinear"):
        hpfx.converter_device_set(net, s, entries[:-1])


def test_synth_waveform_round_trip():
    hs = (1, 5, 7, 11, 13)
    spec = hpfx.six_pulse_spectrum(hs)
    theta, wave = hpfx.synth_waveform(spec, hs, n=2048)
    # re-extract the phasors from the reconstruction
    back = (2.0 / len(theta)) * np.exp(
        -1j * np.outer(np.asarray(hs, float), theta)) @ wave
    np.testing.assert_allclose(back, spec, atol=1e-12)


def test_notch_analysis_radial_divider():
    """Radial feeder: the notch divider at the mid bus equals the
    upstream-reactance fraction X_up/(X_up + X_down) analytically."""
    from hpfx.converters import notch_analysis

    s = hpfx.settings_for_hmax(5, coupled=False)
    net = _three_bus(s)                      # slack -0- 1 -2 (converter)
    alpha, mu = np.deg2rad(25.0), np.deg2rad(12.0)
    rep_c = notch_analysis(net, s, 2, alpha=alpha, mu=mu)
    rep_m = notch_analysis(net, s, 2, alpha=alpha, mu=mu, observe_bus=1)
    # at the converter bus: the full notch
    assert rep_c.depth_pct == pytest.approx(100.0, rel=1e-9)
    # mid bus: impedance divider with the slack an ideal (grounded)
    # source — upstream is line 0 alone, total the series chain:
    # |0.5+2j| / |1.5+6j| = exactly 1/3 on this proportional feeder
    assert rep_m.divider == pytest.approx(1.0 / 3.0, rel=1e-9)
    # width is the commutation angle in time units: 12 deg of 20 ms
    assert rep_m.width_us == pytest.approx(12.0 / 360.0 * 20000.0,
                                           rel=1e-12)
    # area consistency: V_N * t_N
    v_n = np.sqrt(2) * s.base_voltage * np.sin(alpha + mu / 2) \
        * rep_m.divider
    assert rep_m.area_vus == pytest.approx(v_n * rep_m.width_us,
                                           rel=1e-12)
    # class plumbing: dedicated is looser than special
    rep_s = notch_analysis(net, s, 2, alpha=alpha, mu=mu,
                           observe_bus=1, v_class="special")
    rep_d = notch_analysis(net, s, 2, alpha=alpha, mu=mu,
                           observe_bus=1, v_class="dedicated")
    assert rep_s.limit_depth_pct < rep_d.limit_depth_pct
    with pytest.raises(ValueError, match="unknown v_class"):
        notch_analysis(net, s, 2, alpha=alpha, mu=mu, v_class="x")


def test_notch_compliance_moves_with_distance():
    """The notch shrinks upstream: depth and area fall monotonically
    toward the source, and a deep local notch can violate 'general'
    while the upstream PCC complies."""
    from hpfx.converters import notch_analysis

    s = hpfx.settings_for_hmax(5, coupled=False)
    net = _three_bus(s)
    alpha, mu = np.deg2rad(30.0), np.deg2rad(15.0)
    reps = [notch_analysis(net, s, 2, alpha=alpha, mu=mu, observe_bus=b)
            for b in (2, 1, 0)]
    depths = [r.depth_pct for r in reps]
    assert depths[0] > depths[1] > depths[2]
    areas = [r.area_vus for r in reps]
    assert areas[0] > areas[1] > areas[2]
    # converter bus violates the general depth limit (100% > 20%)
    assert not reps[0].compliant
