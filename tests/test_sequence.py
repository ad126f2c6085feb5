"""Sequence-domain post-processing (hpfx/sequence.py).

Fortescue algebra is gated against an independent numpy-complex
implementation; the balanced-spectrum laws (neutral current, delta
blocking, h-mod-3 classification) against their physical definitions
evaluated on explicit three-phase phasor sets.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx import sequence as sq
from hpfx.cx import Cx

from conftest import make_setup


def _to_c(x: Cx) -> np.ndarray:
    return np.asarray(x.re) + 1j * np.asarray(x.im)


def _from_c(z) -> Cx:
    z = np.asarray(z)
    return Cx(jnp.asarray(z.real), jnp.asarray(z.imag))


def test_classify_orders():
    h = (1, 3, 5, 7, 9, 11, 13, 15)
    cls = sq.classify_orders(h)
    assert cls.tolist() == [1, 0, 2, 1, 0, 2, 1, 0]
    assert sq.triplen_mask(h).tolist() == [False, True, False, False,
                                           True, False, False, True]


def test_fortescue_vs_numpy_and_roundtrip():
    rng = np.random.default_rng(0)
    za = rng.normal(size=(5, 3)) + 1j * rng.normal(size=(5, 3))
    zb = rng.normal(size=(5, 3)) + 1j * rng.normal(size=(5, 3))
    zc = rng.normal(size=(5, 3)) + 1j * rng.normal(size=(5, 3))
    seq = sq.sequence_components(_from_c(za), _from_c(zb), _from_c(zc))
    a = np.exp(2j * np.pi / 3)
    np.testing.assert_allclose(_to_c(seq.zero), (za + zb + zc) / 3,
                               atol=1e-12)
    np.testing.assert_allclose(_to_c(seq.positive),
                               (za + a * zb + a * a * zc) / 3, atol=1e-12)
    np.testing.assert_allclose(_to_c(seq.negative),
                               (za + a * a * zb + a * zc) / 3, atol=1e-12)
    # exact inverse
    va, vb, vc = sq.phase_components(seq)
    np.testing.assert_allclose(_to_c(va), za, atol=1e-12)
    np.testing.assert_allclose(_to_c(vb), zb, atol=1e-12)
    np.testing.assert_allclose(_to_c(vc), zc, atol=1e-12)


def test_balanced_phases_sequence_identity():
    """The h-mod-3 rule emerges from the phase expansion: a balanced
    positive-sequence solution's order h lands ENTIRELY in the sequence
    class h % 3 when Fortescue-decomposed."""
    h = (1, 3, 5, 7, 9)
    rng = np.random.default_rng(1)
    V_m = jnp.asarray(rng.uniform(0.5, 1.0, (5, 4)))
    V_a = jnp.asarray(rng.uniform(0, 2 * np.pi, (5, 4)))
    va, vb, vc = sq.balanced_phases(V_m, V_a, h)
    seq = sq.sequence_components(va, vb, vc)
    comps = {0: _to_c(seq.zero), 1: _to_c(seq.positive),
             2: _to_c(seq.negative)}
    for i, order in enumerate(h):
        own = order % 3
        # the own-sequence component carries the full magnitude...
        np.testing.assert_allclose(np.abs(comps[own][i]),
                                   np.asarray(V_m)[i], atol=1e-12)
        # ...and the other two vanish
        for other in set(comps) - {own}:
            np.testing.assert_allclose(np.abs(comps[other][i]), 0.0,
                                       atol=1e-12)


def test_neutral_current_law():
    h = (1, 3, 5, 7, 9)
    I = jnp.asarray([[1.0], [0.2], [0.1], [0.05], [0.04]])
    i_n, rms = sq.neutral_current(I, h)
    np.testing.assert_allclose(np.asarray(i_n)[:, 0],
                               [0.0, 0.6, 0.0, 0.0, 0.12], atol=1e-15)
    np.testing.assert_allclose(np.asarray(rms)[0],
                               np.hypot(0.6, 0.12), atol=1e-15)
    # physical cross-check: the neutral phasor sum of the explicit
    # three-phase currents equals the law's magnitude, order by order
    rng = np.random.default_rng(2)
    ang = jnp.asarray(rng.uniform(0, 2 * np.pi, (5, 1)))
    ia, ib, ic = sq.balanced_phases(I, ang, h)
    s = _to_c(ia) + _to_c(ib) + _to_c(ic)
    np.testing.assert_allclose(np.abs(s), np.asarray(i_n), atol=1e-12)


def test_delta_blocked():
    h = (1, 3, 5, 9)
    spec = jnp.asarray([1.0, 0.3, 0.2, 0.1])
    out = np.asarray(sq.delta_blocked(spec, h))
    np.testing.assert_allclose(out, [1.0, 0.0, 0.2, 0.0], atol=1e-15)
    # axis handling on an (n, H) layout
    spec2 = jnp.asarray(np.tile([1.0, 0.3, 0.2, 0.1], (3, 1)))
    out2 = np.asarray(sq.delta_blocked(spec2, h, axis=1))
    np.testing.assert_allclose(out2[:, 1], 0.0, atol=1e-15)
    np.testing.assert_allclose(out2[:, 2], 0.2, atol=1e-15)


def test_neutral_sizing_on_solved_feeder():
    """End to end: solve net2, reconstruct a line current spectrum, and
    check the rectifier feeder's neutral RMS is material relative to the
    phase RMS (the triplen content is why 4-wire neutrals are sized up)."""
    s, net, dev = make_setup(("net2", 25, True))
    res = hpfx.hpf(net, dev, s)
    fl = hpfx.line_flows(net, s, res.V_m, res.V_a)
    I = fl.I_f.abs()[:, 2]                     # the line feeding the SMPS
    _, rms_n = sq.neutral_current(I, s.harmonics)
    rms_p = float(jnp.sqrt(jnp.sum(I * I)))
    assert float(rms_n) > 0.1 * rms_p
    # the delta-side spectrum carries no triplens
    blocked = sq.delta_blocked(I, s.harmonics)
    tri = sq.triplen_mask(s.harmonics)
    assert np.asarray(blocked)[tri].max() == 0.0
    assert np.allclose(np.asarray(blocked)[~tri], np.asarray(I)[~tri])


# ---------------------------------------------------------------------------
# Sequence-aware harmonic networks


def _seq_setup(coupled=False, h_max=5, stable=False):
    s, net, dev = make_setup(("net1", h_max, coupled))
    if stable:
        s = s.with_(stable_mismatch=True)
    return s, net, dev


def _np_zero_seq_ybus(net, s, *, r0_scale, x0_scale, b0_scale=1.0,
                      blocked=(), bus_Xg=None, ungrounded_shunts=()):
    """Independent numpy-complex zero-sequence Ybus (dense, per order) —
    same physics as build_ybus written as plain loops over the pruned
    zero-sequence line table."""
    n = net.n
    H = len(s.harmonics)
    Y = np.zeros((H, n, n), complex)
    R0 = np.asarray(net.line_R) * r0_scale
    X0 = np.asarray(net.line_X) * x0_scale
    G = np.asarray(net.line_G)
    B = np.asarray(net.line_B) * b0_scale
    tau = np.asarray(net.line_tau)
    shift = np.asarray(net.line_shift)
    f = np.asarray(net.line_from)
    t = np.asarray(net.line_to)
    xsh = np.asarray(net.bus_Xsh).copy()
    for b_ in ungrounded_shunts:
        xsh[int(b_)] = 0.0
    for ih, h in enumerate(s.harmonics):
        for k in range(net.n_lines):
            if k in blocked:
                continue
            ys = 1.0 / (R0[k] + 1j * X0[k] * h)
            ysh = (G[k] + 1j * h * B[k]) / 2.0
            a = tau[k] * np.exp(-1j * shift[k])
            Y[ih, f[k], t[k]] += -ys / a
            Y[ih, t[k], f[k]] += -ys / np.conj(a)
            Y[ih, f[k], f[k]] += (ys + ysh) / tau[k] ** 2
            Y[ih, t[k], t[k]] += ys + ysh
        if h != 1:
            for b_ in range(n):
                if xsh[b_] != 0.0:
                    Y[ih, b_, b_] += 1.0 / (1j * xsh[b_] * h)
        if bus_Xg:
            for b_, xg in bus_Xg.items():
                Y[ih, b_, b_] += 1.0 / (1j * h * xg)
    return Y


def test_sequence_ybus_numpy_oracle():
    """Triplen rows of the blended Y match an independent numpy-complex
    zero-sequence assembly (incl. blocked lines, grounding, ungrounded
    shunt banks); non-triplen rows match build_ybus exactly."""
    s, net, _ = _seq_setup(h_max=5)
    kw = dict(r0_scale=2.5, x0_scale=3.0, b0_scale=0.6)
    blocked, xg, ug = [2, 7], {1: 0.08}, [4]
    Y, lineY, _ = sq.sequence_structures(
        net, s, blocked=blocked, bus_Xg=xg, ungrounded_shunts=ug, **kw)
    assert lineY is None                  # stable_mismatch off
    Yn = _to_c(Y)
    Y1 = _to_c(hpfx.build_ybus(net, s))
    Y0 = _np_zero_seq_ybus(net, s, blocked=blocked, bus_Xg=xg,
                           ungrounded_shunts=ug, **kw)
    tri = sq.triplen_mask(s.harmonics)
    np.testing.assert_allclose(Yn[~tri], Y1[~tri], rtol=0, atol=1e-12)
    np.testing.assert_allclose(Yn[tri], Y0[tri], rtol=0, atol=1e-12)


@pytest.mark.parametrize("stable", [False, True])
def test_hpf_sequence_identity(stable):
    """Coinciding sequence networks reproduce plain hpf exactly (same
    fixed point, same iteration count) — on both mismatch formulations."""
    s, net, dev = _seq_setup(coupled=False, stable=stable)
    base = hpfx.hpf(net, dev, s)
    seq = sq.hpf_sequence(net, dev, s, r0_scale=1.0, x0_scale=1.0)
    assert int(seq.n_iter) == int(base.n_iter)
    np.testing.assert_allclose(np.asarray(seq.V_m), np.asarray(base.V_m),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(seq.V_a), np.asarray(base.V_a),
                               rtol=0, atol=1e-10)


def test_hpf_sequence_nontriplen_invariance():
    """With UNCOUPLED devices the harmonic orders solve independently:
    changing only the zero-sequence network moves the triplen voltages
    and leaves every other order's solution untouched."""
    s, net, dev = _seq_setup(coupled=False)
    base = hpfx.hpf(net, dev, s)
    seq = sq.hpf_sequence(net, dev, s, r0_scale=2.5, x0_scale=3.0,
                          bus_Xg={0: 0.05})
    assert bool(seq.converged) and bool(base.converged)
    tri = sq.triplen_mask(s.harmonics)
    Vb, Vs = np.asarray(base.V_m), np.asarray(seq.V_m)
    np.testing.assert_allclose(Vs[~tri], Vb[~tri], rtol=0, atol=1e-8)
    # the triplen row genuinely responds to the zero-sequence impedances
    assert np.max(np.abs(Vs[tri] - Vb[tri])) > 1e-4


def test_hpf_sequence_stable_mismatch_consistency():
    """The blended stable-mismatch structures describe the same system as
    the blended dense Y: both formulations converge to the same state."""
    s, net, dev = _seq_setup(coupled=True, stable=False)
    kw = dict(r0_scale=2.0, x0_scale=3.0, blocked=[5], bus_Xg={2: 0.1})
    plain = sq.hpf_sequence(net, dev, s, **kw)
    stab = sq.hpf_sequence(net, dev, s.with_(stable_mismatch=True), **kw)
    assert bool(plain.converged) and bool(stab.converged)
    np.testing.assert_allclose(np.asarray(stab.V_m), np.asarray(plain.V_m),
                               rtol=0, atol=1e-8)


def test_delta_device_set_masking():
    """Triplen I_N rows (and Y_N rows+columns when coupled) of the chosen
    devices vanish; everything else is untouched."""
    s, net, dev = _seq_setup(coupled=True)
    masked = sq.delta_device_set(dev, s, delta=[0, 3])
    tri = sq.triplen_mask(s.harmonics)
    I0, I1 = _to_c(dev.I_N), _to_c(masked.I_N)
    Y0, Y1 = _to_c(dev.Y_N), _to_c(masked.Y_N)
    for k in range(dev.n_devices):
        if k in (0, 3):
            assert np.all(I1[k][tri] == 0)
            assert np.all(Y1[k][tri, :] == 0) and np.all(Y1[k][:, tri] == 0)
            np.testing.assert_array_equal(
                I1[k][~tri], I0[k][~tri])
            np.testing.assert_array_equal(
                Y1[k][np.ix_(~tri, ~tri)], Y0[k][np.ix_(~tri, ~tri)])
        else:
            np.testing.assert_array_equal(I1[k], I0[k])
            np.testing.assert_array_equal(Y1[k], Y0[k])


def test_hpf_sequence_delta_devices_solve():
    """Solving with one delta-connected converter: non-triplen orders are
    bit-comparable to the unmasked solve (uncoupled — independent orders),
    the triplen row drops (one source removed) but stays nonzero (six wye
    devices remain, so no #39a singularity)."""
    s, net, dev = _seq_setup(coupled=False)
    base = sq.hpf_sequence(net, dev, s, r0_scale=1.0, x0_scale=1.0)
    delta = sq.hpf_sequence(net, dev, s, r0_scale=1.0, x0_scale=1.0,
                            delta_devices=[0])
    assert bool(base.converged) and bool(delta.converged)
    tri = sq.triplen_mask(s.harmonics)
    Vb, Vd = np.asarray(base.V_m), np.asarray(delta.V_m)
    np.testing.assert_allclose(Vd[~tri], Vb[~tri], rtol=0, atol=1e-8)
    assert np.max(Vd[tri]) > 1e-6                  # still excited
    assert np.max(np.abs(Vd[tri] - Vb[tri])) > 1e-6   # but moved


def test_blocked_line_matches_pruned_network():
    """A zero-sequence-blocked line is equivalent to REMOVING it from the
    zero-sequence companion network entirely (series and pi shunt)."""
    s, net, _ = _seq_setup(h_max=5)
    k = 4
    Y_blk, _, _ = sq.sequence_structures(net, s, blocked=[k],
                                         r0_scale=2.5, x0_scale=3.0)
    import dataclasses as dc
    keep = np.arange(net.n_lines) != k
    pruned = dc.replace(
        net,
        line_from=net.line_from[keep], line_to=net.line_to[keep],
        line_R=net.line_R[keep], line_X=net.line_X[keep],
        line_G=net.line_G[keep], line_B=net.line_B[keep],
        line_tau=net.line_tau[keep], line_shift=net.line_shift[keep])
    net0p = sq.zero_sequence_network(pruned, r0_scale=2.5, x0_scale=3.0)
    Y0p = _to_c(hpfx.build_ybus(net0p, s))
    tri = sq.triplen_mask(s.harmonics)
    np.testing.assert_allclose(_to_c(Y_blk)[tri], Y0p[tri],
                               rtol=0, atol=1e-12)


@pytest.mark.parametrize("layout", ["vmap", "lanes"])
def test_sequence_sweep_composition(layout):
    """The (Y, lineY, lineY_f) triple from sequence_structures threads
    through hpf_sweep on BOTH batch layouts (keeping the stable
    mismatch), and each scenario row reproduces the single-case
    hpf_sequence solve."""
    from hpfx.solve import Scenarios, hpf_sweep

    s, net, dev = _seq_setup(coupled=False, stable=True)
    s = s.with_(layout=layout)
    kw = dict(r0_scale=2.5, x0_scale=3.0, blocked=[5], bus_Xg={2: 0.1})
    structs = sq.sequence_structures(net, s, **kw)
    B = 3
    scen = Scenarios(p_scale=jnp.asarray([0.9, 1.0, 1.1], s.real_dtype))
    out = hpf_sweep(net, dev, s, scen, Y=structs)
    assert bool(np.all(out.converged))
    import dataclasses as dc
    for k, p in enumerate([0.9, 1.0, 1.1]):
        net_k = dc.replace(net, bus_P=net.bus_P * p, bus_Q=net.bus_Q * p)
        single = sq.hpf_sequence(net_k, dev, s, **kw)
        np.testing.assert_allclose(np.asarray(out.V_m[k]),
                                   np.asarray(single.V_m),
                                   rtol=0, atol=1e-9)
        assert int(out.n_iter[k]) == int(single.n_iter)
