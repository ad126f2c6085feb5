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
