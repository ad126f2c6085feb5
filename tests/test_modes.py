"""Harmonic resonance mode analysis (hpfx.modes).

Oracle: numpy's full complex eigendecomposition of the same Ybus
(``modal_spectrum``) — the device-path batched inverse iteration must
reproduce the smallest-|lambda| mode to fp noise, including the left
eigenvector and participation factors on a nonreciprocal (phase-shifted)
network.  Physics gate: the analytic L-C feeder resonance of
tests/test_impedance.py must appear as the modal-impedance peak with the
far bus as critical bus, and the eigenvalue sensitivities must match
central finite differences of the re-solved eigenvalue.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpfx
from hpfx.modes import (critical_mode, eigen_sensitivity, modal_peaks,
                        modal_scan, modal_spectrum)
from hpfx.ybus import build_ybus

from conftest import DATA


def _np_complex(Y):
    return np.asarray(Y.re) + 1j * np.asarray(Y.im)


def _load(net_name, h_max=25):
    s = hpfx.settings_for_hmax(h_max, coupled=True)
    net = hpfx.load_network(f"{DATA}/{net_name}_buses.csv",
                            f"{DATA}/{net_name}_lines.csv", s)
    return s, net


def _lc_feeder(tmp_path, X=0.1, target_h=7):
    """Slack—(R,X)—bus with pi charging B: parallel resonance at
    h* = sqrt(2/(X·B)) (same construction as tests/test_impedance.py)."""
    B = 2.0 / (X * target_h ** 2)
    (tmp_path / "b.csv").write_text(
        "ID;type;component;S;P;Q;X_sh\n"
        "1;slack;generator;0;0;0;0\n"
        "2;PQ;nothing;0;0;0;0\n")
    (tmp_path / "l.csv").write_text(
        "ID;fromID;toID;R;X;G;B\n"
        f"1;1;2;0.001;{X};0;{B}\n")
    s = hpfx.settings_for_hmax(25, coupled=True)
    return s, hpfx.load_network(str(tmp_path / "b.csv"),
                                str(tmp_path / "l.csv"), s)


@pytest.mark.parametrize("net_name", ["net1", "net2", "net3"])
def test_critical_mode_matches_numpy_eig(net_name):
    s, net = _load(net_name)
    Y = build_ybus(net, s)[:, 1:, 1:]          # grounded-slack reduction
    mode = jax.jit(lambda Y: critical_mode(Y, symmetric=True))(Y)
    # near-degenerate |lam1|≈|lam2| orders converge slowly (gated below);
    # the typical order must certify to fp noise
    assert float(jnp.median(mode.residual)) < 1e-12
    Yc = _np_complex(Y)
    checked = 0
    for h in range(Yc.shape[0]):
        lam, V, PF = modal_spectrum(Yc[h])
        # the plain phase converges at rate r = |lam1/lam2| per step; the
        # shifted refinement then polishes to fp noise PROVIDED the plain
        # phase's eigenvalue estimate landed closer to lam1 than lam2 —
        # gate on that (near-crossings excluded; resonant orders, the ones
        # RMA exists for, are the MOST separated)
        r = abs(lam[0]) / abs(lam[1])
        gap = abs(lam[1] - lam[0]) / abs(lam[0])
        if r ** 24 > 0.1 * gap:
            continue
        checked += 1
        got = complex(float(mode.lam.re[h]), float(mode.lam.im[h]))
        assert abs(got - lam[0]) <= 1e-9 * abs(lam[0])
        np.testing.assert_allclose(
            _np_complex(mode.participation)[h], PF[:, 0],
            atol=1e-8 * np.abs(PF[:, 0]).max())
    assert checked >= Yc.shape[0] // 2   # the gate must not eat the test


def test_participation_sums_to_one():
    s, net = _load("net2")
    Y = build_ybus(net, s)[:, 1:, 1:]
    mode = critical_mode(Y, symmetric=True)
    tot = _np_complex(mode.participation).sum(axis=-1)
    np.testing.assert_allclose(tot, np.ones_like(tot), atol=1e-10)


def test_symmetric_flag_consistent():
    """On a reciprocal network the two-sided iteration must agree with
    the symmetric shortcut (w = v)."""
    s, net = _load("net3")
    Y = build_ybus(net, s)[:, 1:, 1:]
    a = critical_mode(Y, symmetric=True)
    b = critical_mode(Y, symmetric=False)
    np.testing.assert_allclose(np.asarray(a.lam.re), np.asarray(b.lam.re),
                               rtol=1e-10)
    np.testing.assert_allclose(_np_complex(a.participation),
                               _np_complex(b.participation), atol=1e-9)


def test_nonreciprocal_left_eigenvector():
    """A phase-shifting transformer makes Y nonsymmetric; the two-sided
    iteration must still reproduce numpy's smallest mode AND its
    participation (which now needs the genuine left eigenvector)."""
    s = hpfx.settings_for_hmax(13, coupled=True)
    net = hpfx.network_from_arrays(
        bus_types=[0, 2, 2], components=["generator", "x", "y"],
        P=[0, 0.2, 0.1], Q=[0, 0.1, 0.05], X_sh=[0, 0.8, 0],
        line_from=[0, 1], line_to=[1, 2],
        R=[0.01, 0.02], X=[0.1, 0.25], B=[0.05, 0.02],
        tau=[1.0, 0.98], phase_shift=[0.0, 30.0], settings=s)
    Y = build_ybus(net, s)[:, 1:, 1:]
    Yc = _np_complex(Y)
    assert np.abs(Yc - np.swapaxes(Yc, -1, -2)).max() > 1e-6  # really nonsym
    mode = critical_mode(Y, symmetric=False)
    checked = 0
    for h in range(Yc.shape[0]):
        lam, V, PF = modal_spectrum(Yc[h])
        r = abs(lam[0]) / abs(lam[1])
        gap = abs(lam[1] - lam[0]) / abs(lam[0])
        if r ** 24 > 0.1 * gap:
            continue
        checked += 1
        got = complex(float(mode.lam.re[h]), float(mode.lam.im[h]))
        assert abs(got - lam[0]) <= 1e-8 * abs(lam[0])
        np.testing.assert_allclose(
            _np_complex(mode.participation)[h], PF[:, 0],
            atol=1e-7 * np.abs(PF[:, 0]).max())
    assert checked >= 2


def test_modal_scan_finds_lc_resonance(tmp_path):
    s, net = _lc_feeder(tmp_path)
    scan = jax.jit(lambda: modal_scan(net, s))()
    is_peak, h_res, bus_res = modal_peaks(scan)
    assert int(h_res) == 7
    assert int(bus_res) == 1            # the far (non-slack) bus dominates
    hi = list(s.harmonics).index(7)
    assert bool(is_peak[hi])
    # slack participation is re-embedded as zero in a grounded scan
    assert float(jnp.max(scan.participation[:, 0])) == 0.0
    # near the resonance the critical mode dominates: Z_kk ≈ PF_k / lam
    zmag = hpfx.driving_point_impedance(net, s)
    approx = scan.participation[hi, 1] * scan.z_modal[hi]
    assert abs(float(approx) - float(zmag[hi, 1])) < 0.02 * float(zmag[hi, 1])


def test_modal_scan_dense_grid_and_devices():
    """Off-grid scan brackets the integer peak, and folding the device
    Norton admittances shifts/damps the passive mode (operational vs
    passive scans differ)."""
    s, net = _load("net2")
    dev = hpfx.load_device_set(net, s)
    grid = tuple(np.round(np.arange(2.0, 26.0, 0.5), 3))
    passive = modal_scan(net, s, h_grid=grid)
    oper = modal_scan(net, s, h_grid=grid, devices=dev)
    assert passive.z_modal.shape == (len(grid),)
    assert float(jnp.max(jnp.abs(passive.z_modal - oper.z_modal))) > 1e-6
    # typical grid point certified converged (crossing points are slower
    # but their z_modal stays accurate: lam1 ≈ lam2 there by definition)
    assert float(jnp.median(passive.residual)) < 1e-10
    assert float(jnp.median(oper.residual)) < 1e-10


def test_eigen_sensitivity_matches_finite_differences():
    s, net = _load("net2", h_max=13)
    order = 5.0
    lam, sens = eigen_sensitivity(net, s, order)

    def lam_at(**edits):
        n2 = dataclasses.replace(
            net, **{k: getattr(net, k) + d for k, d in edits.items()})
        Y = build_ybus(n2, s.with_(harmonics=(order,)))[:, 1:, 1:]
        m = critical_mode(Y[0], symmetric=True)
        return complex(float(m.lam.re), float(m.lam.im))

    eps = 1e-6
    # bus_Xsh must be probed at a bus that HAS a shunt: X_sh = 0 means
    # "no shunt" (a discontinuity, not a zero-valued parameter)
    xsh_idx = int(np.argmax(np.abs(np.asarray(net.bus_Xsh))))
    assert float(np.asarray(net.bus_Xsh)[xsh_idx]) != 0.0
    for param, idx in (("line_X", 2), ("bus_Xsh", xsh_idx),
                       ("line_R", 0), ("line_B", 1)):
        base = np.asarray(getattr(net, param))
        d = np.zeros_like(base)
        d[idx] = eps
        fd = (lam_at(**{param: jnp.asarray(d)})
              - lam_at(**{param: jnp.asarray(-d)})) / (2 * eps)
        got = complex(float(sens[param]["dlam"].re[..., idx].sum()),
                      float(sens[param]["dlam"].im[..., idx].sum()))
        assert abs(got - fd) <= 1e-4 * max(abs(fd), 1e-9), (param, got, fd)
        # dz_modal consistency: d(1/|lam|) chain rule
        lam_c = complex(float(lam.re), float(lam.im))
        dz_fd = (-(lam_c.real * fd.real + lam_c.imag * fd.imag)
                 / abs(lam_c) ** 3)
        got_dz = float(sens[param]["dz_modal"][..., idx].sum())
        assert abs(got_dz - dz_fd) <= 1e-4 * max(abs(dz_fd), 1e-9)


def test_modal_scan_matches_integer_critical_mode():
    """At integer grid points the scan equals critical_mode of the
    operationally folded integer Ybus (interp is exact on-grid)."""
    s, net = _load("net3")
    dev = hpfx.load_device_set(net, s)
    scan = modal_scan(net, s, devices=dev)
    from hpfx.impedance import _fold_norton, _norton_diag
    Y = _fold_norton(build_ybus(net, s), net, _norton_diag(dev))[:, 1:, 1:]
    mode = critical_mode(Y, symmetric=True)
    np.testing.assert_allclose(np.asarray(scan.z_modal),
                               np.asarray(mode.z_modal), rtol=1e-10)
