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

The bridge carries the reference's actual Simulink diode parameters (two
powerlib Diodes per arm: Ron = 0.001 Ohm, Vf = 0.8 V — SMPS.mdl/EV_X.mdl
blocks) and is integrated with an unconditionally stable split-exponential
substep (see ``_rectifier_step``); the measured injection is the *bridge*
current, the reference scope's signal.  Fed identical inputs, the
simulator reproduces the shipped smps.mat Simulink spectra to ~1e-3.

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
    """Single-phase diode-bridge rectifier elements [SI units].

    ``v_drop``/``R_on`` default to the reference Simulink diode pair:
    every conduction path crosses two powerlib Diodes with Ron = 0.001 Ohm
    and Vf = 0.8 V (SMPS.mdl / EV_X.mdl diode blocks; snubbers off,
    Lon = 0), i.e. 0.002 Ohm and 1.6 V per bridge arm.
    """

    R1: float       # series resistance [Ohm]
    L1: float       # series inductance [H]
    C_emi: float    # EMI filter capacitance at the bridge input [F]
    C_dc: float     # DC-link capacitance [F]
    R_eq: float     # equivalent DC load [Ohm]
    v_drop: float = 1.6    # bridge forward drop, 2 x diode Vf [V]
    R_on: float = 0.002    # bridge on-resistance, 2 x diode Ron [Ohm]


def smps_params() -> RectifierParams:
    """The reference's SMPS circuit *as actually simulated*.

    SMPS.mdl hardcodes its branch values (unlike EV_X.mdl, which reads
    workspace variables), so the constants in sim_FFT.m:27-31 never reach
    the model.  In particular the series inductance is the .mdl's
    L1 = 0.006e-6 H — the value sim_FFT.m:28 flags as "before 0.006e-6,
    probably mistake?" but never actually replaced in the circuit.  Using
    the .mdl values reproduces the shipped smps.mat measurement sweep to
    ~1e-3 (tests/test_simulate.py::test_matches_simulink_measurements);
    with the script's 6e-6 the harmonic phases drift linearly in h.
    """
    return RectifierParams(R1=0.0179, L1=0.006e-6, C_emi=35.26e-6,
                           C_dc=0.0399, R_eq=15.11)


_EV_TABLE = {
    # model: (p_rated [kW], v_dc, X_C_dc_pu, X_C_emi_pu, X_L1_pu, R1_pu)
    "EV_1": (0.11, 315.0, 0.0258, 9.198, 3.17e-6, 0.0049),
    "EV_2": (0.12, 310.0, 0.0834, 12.58, 6.83e-5, 0.0028),
    "EV_4": (2.19, 300.0, 0.0796, 90.26, 6.01e-4, 0.0179),
    # EV_5 is the 3-phase car charger (sim_FFT.m:67-88): p_rated = 2.18 kW
    # per phase x 3; characterized per phase (see ev_protocol)
    "EV_5": (2.18 * 3, 305.0, 0.447, 601.0, 7.72e-4, 0.0356),
}

#: models whose reference characterization is three-phase: i_base carries a
#: 1/sqrt(3) and r_base another (sim_FFT.m:95-100), which cancel to the same
#: r_base = v_base^2/p_base as single-phase, but the *fundamental supply*
#: is divided by sqrt(3) (sim_FFT.m:82) — per-phase voltage of the bridge
_EV_THREE_PHASE = frozenset({"EV_5"})


def ev_params(model: str, net_freq: float = 50.0) -> RectifierParams:
    """EV charger circuits from the Collin 2011/2014 per-unit tables
    (sim_FFT.m:37-88, per-unit conversion :91-139, R_eq from eq. 5.3 at
    :106,:129).  For the 3-phase EV_5, i_base = p/(v*sqrt(3)) and
    r_base = v/(i_base*sqrt(3)) (:95-97) reduce to the same
    r_base = v^2/p as the single-phase models, so one formula serves all;
    the 3-phase supply-voltage scaling lives in :func:`ev_protocol`."""
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
    #: the full reference range 150..5050 Hz (sim_FFT.m:20-22
    #: supply_harmonics = f*(3:2:h_max/f) with h_max = 5050): odd
    #: harmonics 3..101, so fitted NE tables cover h <= 101 — a superset
    #: of the shipped smps_NE.csv's h <= 99
    harm_freqs: Tuple[float, ...] = tuple(50.0 * h for h in range(3, 102, 2))
    harm_mags: Tuple[float, float] = (1.15 * np.sqrt(2), 2.3 * np.sqrt(2))
    harm_phase_deg: float = 20.0
    t_start: float = 0.06
    cycles: int = 1
    dt: float = 1e-6
    substeps: int = 4
    h_max: float = 5050.0
    #: fundamental (magnitude, phase) applied during the *harmonic* sims.
    #: None = measurement 1's values, which is what the NE math assumes.
    #: The reference script instead leaks measurement 2's magnitude (``Va``
    #: is never reset in the loop, sim_FFT.m:242-249) — set these to
    #: replicate its recorded sweeps exactly (smps.mat has V_m_f = 200).
    harm_fund_mag: float = None
    harm_fund_phase_deg: float = None


def ev_protocol(model: str, **overrides) -> SweepProtocol:
    """Measurement protocol for an EV model: the default sweep, with the
    fundamental supply divided by sqrt(3) for the 3-phase EV_5
    (sim_FFT.m:82 ``supply_voltage_f = supply_voltage_f/sqrt(3)``)."""
    proto = SweepProtocol(**overrides)
    if model in _EV_THREE_PHASE:
        proto = dataclasses.replace(
            proto, fund_mags=tuple(v / np.sqrt(3.0) for v in proto.fund_mags))
    return proto


def bridge_current(params: RectifierParams, state):
    """Instantaneous bridge (rectifier-input) current — the signal the
    reference's current scope measures.  Proven measurement point: fed the
    smps.mat protocol, this signal reproduces the shipped Simulink spectra
    to ~1e-3 at every odd-harmonic bin, while the *source* current differs
    at the fundamental by exactly C_emi's quadrature current (~8.5%)."""
    i_l, v_e, v_dc = state
    over = jnp.abs(v_e) - v_dc - params.v_drop
    return jnp.sign(v_e) * jnp.maximum(0.0, over) / params.R_on


def _rectifier_step(params: RectifierParams, dt: float):
    """One split-exponential substep of the rectifier circuit ODE.

    The bridge clamp is *stiff*: its time constant R_on·C_emi is ~70 ns for
    the SMPS and ~1.3 ns for EV_5 at the reference diode Ron, far below any
    practical substep — explicit RK either wedges at tiny steps or silently
    oscillates (round-1's smoothed bridge hid this by inflating R_on 50x,
    which also damped the harmonic spectrum).  Each substep instead
    advances every subsystem by its *exact* linear solution under frozen
    couplings:

    - EMI node v_e: linear drift while the bridge blocks; exact
      exponential decay toward the clamp equilibrium
      u* = v_dc + v_drop + R_on·i_l while it conducts, with a first-order
      turn-on event split inside the substep;
    - DC link v_dc: exact R_eq·C_dc leak plus the conducted charge
      obtained exactly from C_emi flux balance (no R_on sensitivity);
    - series branch i_l: exact R1/L1 exponential response to the
      trapezoidal source and the substep-average v_e (stable even for the
      SMPS's 6 nH, where L1/R1 < substep).

    Unconditionally stable for any (R_on, C_emi); accuracy is gated
    against the reference's own Simulink output (smps.mat) in
    tests/test_simulate.py::test_matches_simulink_measurements.
    """
    tau = params.R_on * params.C_emi

    def step(state, v_s0, v_s1):
        i_l, v_e, v_dc = state
        thr = v_dc + params.v_drop

        # EMI node: blocking drift (sign-free; v_e may cross zero)
        v_drift = v_e + dt * i_l / params.C_emi
        # conduction polarity at substep start, else after a drift crossing
        s0 = jnp.where(v_e >= thr, 1.0, jnp.where(v_e <= -thr, -1.0, 0.0))
        s_x = jnp.where(v_drift > thr, 1.0,
                        jnp.where(v_drift < -thr, -1.0, 0.0))
        started = s0 != 0.0
        s_eff = jnp.where(started, s0, s_x)
        conducting = s_eff != 0.0
        s = jnp.where(conducting, s_eff, 1.0)
        # turn-on event: fraction of the substep spent blocking
        db = v_drift - v_e
        db_safe = jnp.where(jnp.abs(db) > 1e-30, db, 1e-30)
        theta = jnp.where(started, 0.0,
                          jnp.clip((s * thr - v_e) / db_safe, 0.0, 1.0))
        h_c = jnp.where(conducting, (1.0 - theta) * dt, 0.0)
        # exact clamp exponential in u = s·v_e coordinates
        u0 = jnp.where(started, s * v_e, thr)
        u_star = thr + params.R_on * s * i_l
        u_end = u_star + (u0 - u_star) * jnp.exp(-h_c / tau)
        v_e_new = jnp.where(conducting, s * u_end, v_drift)
        # conducted charge, exactly, from C_emi flux balance over [theta, 1]
        q_c = jnp.where(conducting,
                        s * i_l * h_c - params.C_emi * (u_end - u0), 0.0)
        q_c = jnp.maximum(q_c, 0.0)   # O(dt) turn-off inside the substep
        # DC link: exact leak + impulse charge
        v_dc_new = v_dc * jnp.exp(-dt / (params.R_eq * params.C_dc)) \
            + q_c / params.C_dc
        # series branch: exact R1/L1 exponential toward the average drive
        el = jnp.exp(-dt * params.R1 / params.L1)
        drive = (0.5 * (v_s0 + v_s1) - 0.5 * (v_e + v_e_new)) / params.R1
        i_l_new = i_l * el + (1.0 - el) * drive
        return jnp.stack([i_l_new, v_e_new, v_dc_new])

    return step


def simulate_rectifier(params: RectifierParams, source_fn, t_end: float,
                       dt: float = 1e-6, substeps: int = 4):
    """Integrate the rectifier circuit; returns (i_inj, v_source) sampled at
    ``dt``, where ``i_inj`` is the *bridge* current — the reference scope's
    measured injection signal (see :func:`bridge_current`).  ``source_fn(t)``
    gives the supply voltage.  Jittable; the time loop is a single lax.scan
    with a fixed-count substep inner loop."""
    n = int(round(t_end / dt))
    h = dt / substeps
    step = _rectifier_step(params, h)
    ts = jnp.arange(n + 1) * dt

    def outer(state, t0):
        def inner(k, st):
            tk = t0 + k * h
            return step(st, source_fn(tk), source_fn(tk + h))
        new = jax.lax.fori_loop(0, substeps, inner, state)
        return new, (bridge_current(params, state), source_fn(t0))

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
    hf_mag = p.fund_mags[0] if p.harm_fund_mag is None else p.harm_fund_mag
    hf_ph = (p.fund_phases_deg[0] if p.harm_fund_phase_deg is None
             else p.harm_fund_phase_deg)
    for fh in p.harm_freqs:
        for vh in p.harm_mags:
            sims.append((hf_mag, hf_ph, vh, fh, p.harm_phase_deg))
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
