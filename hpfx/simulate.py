"""Time-domain rectifier simulation: the device-characterization front end.

JAX replacement for the reference's offline MATLAB/Simulink step
(``Circuit Simulation/SMPS.mdl``/``EV1.mdl``/``EV_X.mdl`` driven by
``sim_FFT.m``): simulate a single-phase diode-bridge rectifier under a
fundamental + single-harmonic voltage source, FFT one steady-state window,
and assemble the measurement sweep that the Norton-equivalent fits consume
(``hpfx.ne_pipeline``).  The entire L0 -> L1 -> L4 chain (circuit ->
NE table -> harmonic power flow) thereby runs inside one framework with no
MATLAB dependency.

Circuit model (sim_FFT.m:26-31 SMPS parameters; EV chargers :37-88 from
Collin 2011/2014 per-unit tables, R_eq = (0.006·v_dc - 0.01)·r_base at
:106,129):

    v_s --- R1 --- L1 ---+--- diode bridge ---+---+
                         |                    |   |
                       C_emi               C_dc  R_eq
                         |                    |   |
    ---------------------+--------------------+---+

The ideal bridge is smoothed with a small on-resistance and forward drop
(i_cond = max(0, |v_e| - v_dc - v_drop)/R_on), integrated with Heun's
method at a sub-microsecond step — explicit integration is stable because
R_on·C_emi and sqrt(L1·C_emi) stay well above the substep.

Measurement protocol (sim_FFT.m:14-22, 158-239, 242-324): two
fundamental-only sims varying magnitude/phase, then a (harmonic frequency x
magnitude) grid with the fundamental held at measurement 1.  (The reference
script leaks the *second* fundamental magnitude into its harmonic sweep —
``Va`` is never reset in the loop at :242-249 — while its NE math assumes
the first; this implementation applies the protocol the NE math assumes.)
FFT post-processing mirrors :174-191: single-sided magnitude spectrum,
interior bins doubled, +pi/2 phase correction (sin-source to cosine-phasor
convention), spectrum truncated to cycles·h_max/f bins.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ne_pipeline import MeasurementSet


@dataclasses.dataclass(frozen=True)
class RectifierParams:
    """Single-phase diode-bridge rectifier elements [SI units]."""

    R1: float       # series resistance [Ohm]
    L1: float       # series inductance [H]
    C_emi: float    # EMI filter capacitance at the bridge input [F]
    C_dc: float     # DC-link capacitance [F]
    R_eq: float     # equivalent DC load [Ohm]
    v_drop: float = 1.4   # bridge forward drop (2 diodes) [V]
    R_on: float = 0.1     # smoothed bridge on-resistance [Ohm]


def smps_params() -> RectifierParams:
    """The reference's SMPS circuit (sim_FFT.m:27-31)."""
    return RectifierParams(R1=0.0179, L1=6e-6, C_emi=35.26e-6,
                           C_dc=0.0399, R_eq=15.11)


_EV_TABLE = {
    # model: (p_rated [kW], v_dc, X_C_dc_pu, X_C_emi_pu, X_L1_pu, R1_pu)
    "EV_1": (0.11, 315.0, 0.0258, 9.198, 3.17e-6, 0.0049),
    "EV_2": (0.12, 310.0, 0.0834, 12.58, 6.83e-5, 0.0028),
    "EV_4": (2.19, 300.0, 0.0796, 90.26, 6.01e-4, 0.0179),
}


def ev_params(model: str, net_freq: float = 50.0) -> RectifierParams:
    """EV charger circuits from the Collin 2011/2014 per-unit tables
    (sim_FFT.m:37-66, per-unit conversion :119-139, R_eq from eq. 5.3 at
    :129)."""
    if model not in _EV_TABLE:
        raise ValueError(f"unknown EV model {model!r}; have {list(_EV_TABLE)}")
    p_rated, v_dc, xcdc, xcemi, xl1, r1 = _EV_TABLE[model]
    v_base = 230.0
    p_base = p_rated * 1000.0
    i_base = p_base / v_base
    r_base = v_base / i_base
    omega = 2 * np.pi * net_freq
    return RectifierParams(
        R1=r1 * r_base,
        L1=xl1 * r_base / omega,
        C_dc=1.0 / (xcdc * r_base) / omega,
        C_emi=1.0 / (xcemi * r_base) / omega,
        R_eq=(0.006 * v_dc - 0.01) * r_base)


@dataclasses.dataclass(frozen=True)
class SweepProtocol:
    """The sim_FFT.m measurement protocol (:14-22, 141-152)."""

    net_freq: float = 50.0
    fund_mags: Tuple[float, float] = (230.0 * np.sqrt(2),
                                      0.8 * 230.0 * np.sqrt(2))
    fund_phases_deg: Tuple[float, float] = (0.0, 10.0)
    harm_freqs: Tuple[float, ...] = tuple(50.0 * h for h in range(3, 20, 2))
    harm_mags: Tuple[float, float] = (1.15 * np.sqrt(2), 2.3 * np.sqrt(2))
    harm_phase_deg: float = 20.0
    t_start: float = 0.06
    cycles: int = 1
    dt: float = 1e-6
    substeps: int = 4
    h_max: float = 5050.0


def _rectifier_step(params: RectifierParams, dt: float):
    """One Heun (RK2) substep of the circuit ODE."""

    def deriv(state, v_s):
        i_l, v_e, v_dc = state
        i_cond = jnp.maximum(
            0.0, (jnp.abs(v_e) - v_dc - params.v_drop)) / params.R_on
        i_b_ac = jnp.sign(v_e) * i_cond
        di = (v_s - params.R1 * i_l - v_e) / params.L1
        dve = (i_l - i_b_ac) / params.C_emi
        dvdc = (i_cond - v_dc / params.R_eq) / params.C_dc
        return jnp.stack([di, dve, dvdc])

    def step(state, v_s0, v_s1):
        k1 = deriv(state, v_s0)
        k2 = deriv(state + dt * k1, v_s1)
        return state + 0.5 * dt * (k1 + k2)

    return step


def simulate_rectifier(params: RectifierParams, source_fn, t_end: float,
                       dt: float = 1e-6, substeps: int = 4):
    """Integrate the rectifier ODE; returns (i_source, v_source) sampled at
    ``dt``.  ``source_fn(t)`` gives the supply voltage.  Jittable; the time
    loop is a single lax.scan with a fixed-count substep inner loop."""
    n = int(round(t_end / dt))
    h = dt / substeps
    step = _rectifier_step(params, h)
    ts = jnp.arange(n + 1) * dt

    def outer(state, t0):
        def inner(k, st):
            tk = t0 + k * h
            return step(st, source_fn(tk), source_fn(tk + h))
        new = jax.lax.fori_loop(0, substeps, inner, state)
        return new, (state[0], source_fn(t0))

    init = jnp.zeros(3)
    _, (i_s, v_s) = jax.lax.scan(outer, init, ts)
    return i_s, v_s


def _fft_window(signal: np.ndarray, n_keep: int):
    """Reference FFT post-processing (sim_FFT.m:174-191): single-sided
    magnitude with interior doubling, +pi/2 phase, truncated spectrum."""
    L = len(signal)
    ft = np.fft.fft(np.asarray(signal))
    mag = np.abs(ft / L)[: L // 2 + 1]
    mag[1:-1] *= 2.0
    phase = np.angle(ft[: L // 2 + 1]) + np.pi / 2
    return mag[:n_keep], phase[:n_keep]


def characterize_rectifier(params: RectifierParams,
                           protocol: SweepProtocol = SweepProtocol()
                           ) -> MeasurementSet:
    """Run the full measurement sweep and assemble a MeasurementSet.

    All simulations in the sweep share one compiled program (vmap over the
    per-sim source parameters).
    """
    p = protocol
    f = p.net_freq
    t_win = p.cycles / f
    t_end = p.t_start + t_win
    L = int(round(t_win / p.dt))
    n_keep = int(round(p.cycles * p.h_max / f)) + 1
    i0 = int(round(p.t_start / p.dt))
    w = 2 * np.pi

    def run(va, pa_deg, vh, fh, ph_deg):
        def source(t):
            return va * jnp.sin(w * f * t + jnp.deg2rad(pa_deg)) + \
                vh * jnp.sin(w * fh * t + jnp.deg2rad(ph_deg))
        return simulate_rectifier(params, source, t_end, p.dt, p.substeps)

    # assemble every sim's source parameters, then one vmapped run
    sims = []
    for k in range(2):
        sims.append((p.fund_mags[k], p.fund_phases_deg[k], 0.0, 0.0, 0.0))
    for fh in p.harm_freqs:
        for vh in p.harm_mags:
            sims.append((p.fund_mags[0], p.fund_phases_deg[0],
                         vh, fh, p.harm_phase_deg))
    cols = [jnp.asarray(col, jnp.float32) for col in zip(*sims)]
    i_all, _ = jax.jit(jax.vmap(run))(*cols)
    i_all = np.asarray(i_all)

    # FFT bin frequencies: f/cycles spacing (sim_FFT.m:147 H = (0:L/2)/L/T)
    spectrum = np.arange(n_keep) / (L * p.dt)

    def inj(idx):
        mag, ph = _fft_window(i_all[idx, i0:i0 + L], n_keep)
        return mag * np.exp(1j * ph)

    n_f = len(p.harm_freqs)
    n_m = len(p.harm_mags)
    fund_V = np.array([
        p.fund_mags[k] * np.exp(1j * np.deg2rad(p.fund_phases_deg[k]))
        for k in range(2)])
    fund_I = np.stack([inj(k) for k in range(2)])
    harm_V = np.array([[vm * np.exp(1j * np.deg2rad(p.harm_phase_deg))
                        for vm in p.harm_mags]] * n_f)
    harm_I = np.stack([
        [inj(2 + i * n_m + j) for j in range(n_m)] for i in range(n_f)])
    return MeasurementSet(
        spectrum=spectrum, fund_V=fund_V, fund_I=fund_I,
        harm_freqs=np.asarray(p.harm_freqs, float),
        harm_V=harm_V, harm_I=harm_I,
        net_freq=f, cycles=p.cycles)
