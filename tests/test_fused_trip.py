"""Fused NR-trip megakernel (QUARANTINED in validation/fused_trip.py):
interpret-mode parity.

The kernel is validated against the unfused lane-major functions it fuses
(hpfx.lanes: arrow step + state update + mismatch).  In f64 the comparison
is tight (same algorithm, fp-reorder noise only — heavy-tailed across
scenarios only where a pivot near-tie flips, which the tolerance covers);
the f32 production semantics are additionally gated by whole-sweep
convergence equality below (the sweep loop is driven locally here — the
former Settings.fused_trip dispatch in hpfx.lanes was removed when the
kernel was quarantined for miscompiling on this backend's Mosaic).
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

import hpfx
from hpfx import lanes as LN
from hpfx.cx import Cx
from hpfx.solve import Scenarios, hpf_sweep
from hpfx.ybus import build_ybus, line_ybus_pair

from conftest import DATA, REPO

sys.path.insert(0, os.path.join(REPO, "validation"))
from fused_trip import fused_trip, make_trip_consts, supports_fused  # noqa: E402


def _setup(net_name, h_max, coupled, stable, dtype):
    s = hpfx.settings_for_hmax(h_max, coupled=coupled).with_(
        solver="arrow", stable_mismatch=stable, dtype=dtype)
    net = hpfx.load_network(f"{DATA}/{net_name}_buses.csv",
                            f"{DATA}/{net_name}_lines.csv", s)
    dev = hpfx.load_device_set(net, s)
    return s, net, dev


def _random_state(H, n, B, rng, dtype):
    V_m = jnp.asarray(np.concatenate(
        [1.0 + 0.05 * rng.standard_normal((1, n, B)),
         0.1 + 0.02 * rng.standard_normal((H - 1, n, B))]), dtype)
    V_a = jnp.asarray(0.1 * rng.standard_normal((H, n, B)), dtype)
    return V_m, V_a


CONFIGS = [
    ("net2", 25, True, True),
    ("net2", 25, False, False),   # uncoupled -> pure block-diagonal step
    ("net3", 25, True, True),     # PV bus (c = 2)
    ("net1", 25, True, True),     # n_nl = 7 at reference scale
]


@pytest.mark.parametrize("net_name,h_max,coupled,stable", CONFIGS,
                         ids=lambda v: str(v))
def test_fused_trip_matches_lanes_f64(net_name, h_max, coupled, stable):
    s, net, dev = _setup(net_name, h_max, coupled, stable, "float64")
    H, n, m, c = s.n_harmonics, net.n, net.m, net.c
    B = 128
    Y = build_ybus(net, s)
    lineY, _ = line_ybus_pair(net, s)
    dims, consts = make_trip_consts(Y, lineY, dev, net, s,
                                    dtype=jnp.float64)
    rng = np.random.default_rng(0)
    V_m, V_a = _random_state(H, n, B, rng, jnp.float64)
    inj = jnp.asarray(np.linspace(0.8, 1.2, B))
    S = Cx(jnp.asarray(net.bus_P)[:, None] * jnp.ones((1, B)),
           jnp.asarray(net.bus_Q)[:, None] * jnp.ones((1, B)))

    # reference: one unfused lane-major trip
    cl = LN._make_arrow_consts(H, n, m, c)
    f0, err0 = LN.mismatch_lanes(V_m, V_a, Y, S, dev, inj, m, n, c, lineY)
    dx = LN.arrow_step_lanes(V_m, V_a, f0, Y, dev, inj, cl)
    D = H * n
    x_new = jnp.concatenate([V_a.reshape(D, B)[1:],
                             V_m.reshape(D, B)[c:]], 0) - dx
    Va_ref = jnp.concatenate([V_a.reshape(D, B)[:1], x_new[: D - 1]],
                             0).reshape(H, n, B)
    Vm_ref = jnp.concatenate([V_m.reshape(D, B)[:c], x_new[D - 1:]],
                             0).reshape(H, n, B)
    f_ref, err_ref = LN.mismatch_lanes(Vm_ref, Va_ref, Y, S, dev, inj,
                                       m, n, c, lineY)

    fperm = jnp.asarray(cl.idx.f_perm)
    f0_g = jnp.zeros_like(f0).at[fperm].set(f0)
    act = jnp.ones((1, B))
    Vm2, Va2, f2_g, err2 = fused_trip(
        dims, consts, V_m, V_a, f0_g, err0[None], act, S.re, S.im,
        inj[None], interpret=True)

    f_ref_g = jnp.zeros_like(f_ref).at[fperm].set(f_ref)
    # tolerance covers pivot-near-tie noise on ill-conditioned scenarios
    # (median diff ~1e-11; isolated scenarios reach ~1e-6 on net1)
    assert float(jnp.max(jnp.abs(Vm2 - Vm_ref))) < 5e-6
    assert float(jnp.max(jnp.abs(Va2 - Va_ref))) < 2e-5
    scale = float(jnp.max(jnp.abs(f_ref))) + 1.0
    assert float(jnp.max(jnp.abs(f2_g - f_ref_g))) / scale < 1e-2
    assert float(jnp.max(jnp.abs(err2[0] - err_ref))) / scale < 1e-2


def test_fused_trip_act_passthrough():
    """act = 0 lanes must keep their state bit-exactly."""
    s, net, dev = _setup("net2", 25, True, True, "float32")
    H, n, m, c = s.n_harmonics, net.n, net.m, net.c
    B = 128
    Y = build_ybus(net, s)
    lineY, _ = line_ybus_pair(net, s)
    dims, consts = make_trip_consts(Y, lineY, dev, net, s)
    rng = np.random.default_rng(1)
    V_m, V_a = _random_state(H, n, B, rng, jnp.float32)
    inj = jnp.ones((B,), jnp.float32)
    S = Cx(jnp.asarray(net.bus_P, jnp.float32)[:, None] *
           jnp.ones((1, B), jnp.float32),
           jnp.asarray(net.bus_Q, jnp.float32)[:, None] *
           jnp.ones((1, B), jnp.float32))
    cl = LN._make_arrow_consts(H, n, m, c)
    f0, err0 = LN.mismatch_lanes(V_m, V_a, Y, S, dev, inj, m, n, c, lineY)
    fperm = jnp.asarray(cl.idx.f_perm)
    f0_g = jnp.zeros_like(f0).at[fperm].set(f0)
    act = jnp.zeros((1, B), jnp.float32)
    Vm2, Va2, f2, err2 = fused_trip(
        dims, consts, V_m, V_a, f0_g, err0[None], act, S.re, S.im,
        inj[None], interpret=True)
    assert float(jnp.max(jnp.abs(Vm2 - V_m))) == 0.0
    assert float(jnp.max(jnp.abs(Va2 - V_a))) == 0.0
    assert float(jnp.max(jnp.abs(f2 - f0_g))) == 0.0
    assert float(jnp.max(jnp.abs(err2[0] - err0))) == 0.0


def _fused_sweep_interpret(net, dev, s, sc):
    """Drive a whole sweep through the quarantined kernel in interpret
    mode: the loop the former Settings.fused_trip dispatch ran inside
    hpf_sweep_lanes (128-lane edge padding, active-mask iteration,
    err_hist bookkeeping), reproduced locally as the tests' oracle."""
    from fused_trip import LANES

    rd = s.real_dtype
    H, n, m, c = s.n_harmonics, net.n, net.m, net.c
    B = sc.p_scale.shape[0]
    Y = build_ybus(net, s)
    lineY, lineY_f = line_ybus_pair(net, s)
    inj = jnp.asarray(sc.injection_scale, rd)
    S = Cx(jnp.asarray(net.bus_P, rd)[:, None] * jnp.asarray(sc.p_scale, rd),
           jnp.asarray(net.bus_Q, rd)[:, None] * jnp.asarray(sc.q_scale, rd))
    fund = LN.solve_fundamental_lanes(Y[0], S, net, s, B, lineY_f)
    V_m = jnp.full((H, n, B), s.v_init_h, rd).at[0].set(fund.V_m)
    V_a = jnp.full((H, n, B), s.a_init_h, rd).at[0].set(fund.V_a)
    consts = LN._make_arrow_consts(H, n, m, c)
    dev_l = LN._as_lane_devices(dev)
    inj_db = LN._as_inj_db(inj, n - m, B, rd)
    f0, err0 = LN.mismatch_lanes(V_m, V_a, Y, S, dev_l, inj_db, m, n, c,
                                 lineY)
    thresh = LN._thresh_lanes(V_m, Y, dev_l, inj_db, m, s)
    dims, tconsts = make_trip_consts(Y, lineY, dev, net, s, dtype=rd)

    Bp = -(-B // LANES) * LANES
    padB = lambda x: x if Bp == B else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)], mode="edge")
    f0_g = f0[jnp.asarray(consts.inv_f_perm)]
    Vp, Ap, fp_, errp = padB(V_m), padB(V_a), padB(f0_g), padB(err0)
    Sp = Cx(padB(S.re), padB(S.im))
    injp, threshp = padB(inj), padB(thresh)
    hist = jnp.full((s.max_iter_h, Bp), jnp.nan, rd)
    it = jnp.zeros((Bp,), jnp.int32)
    t = 0
    # host loop (interpret mode is eager anyway)
    while bool(jnp.any((errp > threshp) & (it < s.max_iter_h))):
        act = (errp > threshp) & (it < s.max_iter_h)
        Vp, Ap, fp_, err2 = fused_trip(
            dims, tconsts, Vp, Ap, fp_, errp[None], act.astype(rd)[None],
            Sp.re, Sp.im, injp[None], interpret=True)
        errp = err2[0]
        hist = hist.at[t].set(jnp.where(act, errp, hist[t]))
        it = it + act.astype(it.dtype)
        t += 1
    V_m, V_a = LN.cleanup_voltages(Vp[..., :B], Ap[..., :B])
    return (jnp.moveaxis(V_m, -1, 0), jnp.moveaxis(V_a, -1, 0),
            errp[:B] <= thresh, it[:B], hist[:, :B].T)


def test_fused_sweep_interpret_converges():
    """Whole fused sweep (interpret) vs the unfused lanes sweep: identical
    convergence flags, phasor agreement at the f32 threshold scale, and a
    batch size that is NOT a multiple of 128 (exercises edge padding)."""
    s, net, dev = _setup("net2", 25, True, True, "float32")
    B = 6
    sc = Scenarios(p_scale=jnp.linspace(0.9, 1.1, B, dtype=jnp.float32),
                   q_scale=jnp.linspace(0.95, 1.05, B, dtype=jnp.float32),
                   injection_scale=jnp.linspace(0.8, 1.2, B,
                                                dtype=jnp.float32))
    r_l = hpf_sweep(net, dev, s.with_(layout="lanes"), sc)
    Vm_f, Va_f, conv_f, n_iter, hist = _fused_sweep_interpret(net, dev, s, sc)
    assert np.asarray(conv_f).all()
    assert np.array_equal(np.asarray(r_l.converged), np.asarray(conv_f))
    pa = np.asarray(r_l.V_m) * np.exp(1j * np.asarray(r_l.V_a))
    pb = np.asarray(Vm_f) * np.exp(1j * np.asarray(Va_f))
    assert np.abs(pa - pb).max() < 5e-4
    # err_hist semantics preserved
    hist = np.asarray(hist)
    n_iter = np.asarray(n_iter)
    for i in range(B):
        assert np.isfinite(hist[i, : n_iter[i]]).all()
        assert np.isnan(hist[i, n_iter[i]:]).all()


def test_supports_fused_size_guard():
    """Oversized problems (net1 at H<=51: Woodbury dim 364) must be
    rejected by the VMEM feasibility guard."""
    s, net, dev = _setup("net1", 51, True, True, "float32")
    Y = build_ybus(net, s)
    lineY, _ = line_ybus_pair(net, s)
    dims, _ = make_trip_consts(Y, lineY, dev, net, s)
    assert not supports_fused(dims)
    s2, net2, dev2 = _setup("net2", 25, True, True, "float32")
    Y2 = build_ybus(net2, s2)
    lineY2, _ = line_ybus_pair(net2, s2)
    dims2, _ = make_trip_consts(Y2, lineY2, dev2, net2, s2)
    assert supports_fused(dims2)
