"""Per-harmonic impedance scan (hpfx.impedance).

Oracle: an independent numpy COMPLEX inversion of the same Ybus — the
split-complex block solve must match it to fp noise.  Physics gate: a
constructed line-L / pi-shunt-C feeder must place its parallel resonance
at the analytic order h* = sqrt(2/(X·B)).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx.impedance import (driving_point_impedance, impedance_scan,
                            resonance_peaks)
from hpfx.ybus import build_ybus

from conftest import DATA


def _np_complex(Y):
    return np.asarray(Y.re) + 1j * np.asarray(Y.im)


@pytest.mark.parametrize("net_name", ["net1", "net2", "net3"])
def test_scan_matches_numpy_inverse(net_name):
    s = hpfx.settings_for_hmax(25, coupled=True)
    net = hpfx.load_network(f"{DATA}/{net_name}_buses.csv",
                            f"{DATA}/{net_name}_lines.csv", s)
    Y = build_ybus(net, s)
    Z = jax.jit(lambda: impedance_scan(net, s))()
    Zc = _np_complex(Z)
    # grounded slack: rows/cols 1: are the inverse of the reduced Y
    ref = np.linalg.inv(_np_complex(Y)[:, 1:, 1:])
    np.testing.assert_allclose(Zc[:, 1:, 1:], ref, atol=1e-12)
    assert np.abs(Zc[:, 0, :]).max() == 0 and np.abs(Zc[:, :, 0]).max() == 0
    # no phase shifters in the fixture nets: Y symmetric => Z symmetric
    np.testing.assert_allclose(Zc, np.swapaxes(Zc, -1, -2), atol=1e-12)


def test_ungrounded_scan_harmonic_rows():
    """With ground_slack=False the raw Y(h) is inverted; valid on net2's
    harmonic rows, where bus shunt reactances tie the network to ground
    (the h=1 block has no shunts in the reference model and is singular,
    which is exactly why grounding is the default)."""
    s = hpfx.settings_for_hmax(25, coupled=True)
    net = hpfx.load_network(f"{DATA}/net2_buses.csv",
                            f"{DATA}/net2_lines.csv", s)
    Y = build_ybus(net, s)
    Z = impedance_scan(net, s, ground_slack=False)
    ref = np.linalg.inv(_np_complex(Y)[1:])
    np.testing.assert_allclose(_np_complex(Z)[1:], ref, atol=1e-10)


def test_lc_resonance_position(tmp_path):
    """A slack—(R,X_L)—bus feeder with pi-line charging B at the far end
    parallel-resonates where the inductive and capacitive branch
    susceptances cancel: h*^2 = 2/(X·B).  X=0.1, B=2/(0.1·49) puts h*=7;
    the scan must peak exactly there (odd harmonics 1..25)."""
    X, target_h = 0.1, 7
    B = 2.0 / (X * target_h ** 2)
    (tmp_path / "b.csv").write_text(
        "ID;type;component;S;P;Q;X_sh\n"
        "1;slack;generator;0;0;0;0\n"
        "2;PQ;nothing;0;0;0;0\n")
    (tmp_path / "l.csv").write_text(
        "ID;fromID;toID;R;X;G;B\n"
        f"1;1;2;0.001;{X};0;{B}\n")
    s = hpfx.settings_for_hmax(25, coupled=True)
    net = hpfx.load_network(str(tmp_path / "b.csv"),
                            str(tmp_path / "l.csv"), s)
    zmag = driving_point_impedance(net, s)
    is_peak, worst_h, worst_z = resonance_peaks(zmag, s)
    assert int(worst_h[1]) == target_h
    hi = list(s.harmonics).index(target_h)
    assert bool(is_peak[hi, 1])
    # resonance dominates the neighbors by the R-limited peak
    assert float(worst_z[1]) > 5 * float(zmag[hi - 1, 1])
    # slack row of a grounded scan is identically zero, never a peak
    assert float(worst_z[0]) == 0 and not bool(is_peak[:, 0].any())


def test_peaks_consistent_with_argmax():
    s = hpfx.settings_for_hmax(51, coupled=True)
    net = hpfx.load_network(f"{DATA}/net1_buses.csv",
                            f"{DATA}/net1_lines.csv", s)
    zmag = driving_point_impedance(net, s)
    is_peak, worst_h, worst_z = resonance_peaks(zmag, s)
    hs = np.asarray(s.harmonics)
    k = np.argmax(np.asarray(zmag), axis=0)
    np.testing.assert_array_equal(np.asarray(worst_h), hs[k])
    # every global max with nonzero magnitude is flagged as a local peak
    nz = np.asarray(worst_z) > 0
    assert all(bool(np.asarray(is_peak)[k[i], i]) for i in
               np.nonzero(nz)[0])
