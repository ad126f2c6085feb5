"""OpenDSS case export (hpfx/opendss.py).

No OpenDSS engine in this image — the gates are structural and numeric
round-trips on the emitted .dss text: every element present, unit
conversions exact against the pu bases, spectra matching the device set.
"""
import re

import numpy as np
import pytest

import hpfx
from conftest import make_setup
from hpfx.opendss import device_spectra_at_nominal, export_opendss_case


def _export(tmp_path, name="net2", h=25, coupled=True):
    s, net, dev = make_setup((name, h, coupled))
    p = tmp_path / "case.dss"
    n_def = export_opendss_case(net, dev, s, str(p))
    return s, net, dev, p.read_text(), n_def


def test_structure_and_counts(tmp_path):
    s, net, dev, txt, n_def = _export(tmp_path)
    assert txt.startswith("! hpfx export")
    assert "Clear" in txt and txt.rstrip().endswith("Solve mode=harmonics")
    assert len(re.findall(r"^New Circuit\.", txt, re.M)) == 1
    # every branch exported exactly once (net2: plain lines only)
    assert len(re.findall(r"^New (Line|Transformer)\.", txt, re.M)) \
        == net.n_lines
    assert len(re.findall(r"^New Spectrum\.", txt, re.M)) \
        == net.n_nonlinear
    # one spectrum-tagged load per device
    assert len(re.findall(r"spectrum=dev\d+", txt)) == net.n_nonlinear
    # definition count is the number of New statements
    assert n_def == len(re.findall(r"^New ", txt, re.M))


def test_unit_conversions_round_trip(tmp_path):
    s, net, dev, txt, _ = _export(tmp_path)
    zb = s.base_impedance
    # line 0 series impedance in ohms
    m = re.search(r"New Line\.line0 .* R1=([\d.eE+-]+) X1=([\d.eE+-]+)",
                  txt)
    assert m
    assert float(m.group(1)) == pytest.approx(float(net.line_R[0]) * zb,
                                              rel=1e-9)
    assert float(m.group(2)) == pytest.approx(float(net.line_X[0]) * zb,
                                              rel=1e-9)
    # slack reactance lands in the Vsource Z1
    m = re.search(r"Z1=\[0, ([\d.eE+-]+)\]", txt)
    assert float(m.group(1)) == pytest.approx(
        float(net.bus_Xsh[0]) * zb, rel=1e-9)
    # linear-bus load in kW/kvar
    m = re.search(r"New Load\.load1 .* kw=([\d.eE+-]+) kvar=([\d.eE+-]+)",
                  txt)
    assert float(m.group(1)) == pytest.approx(
        float(net.bus_P[1]) * s.base_power / 1e3, rel=1e-9)


def test_spectrum_matches_device_set(tmp_path):
    s, net, dev, txt, _ = _export(tmp_path, coupled=True)
    spec = device_spectra_at_nominal(dev, s)
    m = re.search(r"New Spectrum\.dev0 numharm=(\d+) harmonic=\(([^)]*)\) "
                  r"%mag=\(([^)]*)\) angle=\(([^)]*)\)", txt)
    assert m and int(m.group(1)) == len(s.harmonics)
    hs = [float(v) for v in m.group(2).split(",")]
    mags = np.asarray([float(v) for v in m.group(3).split(",")])
    angs = np.asarray([float(v) for v in m.group(4).split(",")])
    np.testing.assert_allclose(hs, np.asarray(s.harmonics, float))
    want = 100.0 * np.abs(spec[0]) / np.abs(spec[0][0])
    np.testing.assert_allclose(mags, want, rtol=1e-5)
    np.testing.assert_allclose(
        np.exp(1j * np.deg2rad(angs)),
        np.exp(1j * np.angle(spec[0])), atol=1e-5)
    # coupled device -> linearization flagged
    assert "linearized at nominal voltage" in txt


def test_converter_spectra_exact_flag(tmp_path):
    """Y_N = 0 converter devices export their spectrum exactly."""
    from hpfx.network import NONLINEAR, PQ, SLACK
    s = hpfx.settings_for_hmax(13, coupled=False)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("generator", "lin_load", "drive"),
        P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2], R=[0.5, 1.0], X=[2.0, 4.0],
        settings=s, per_unit=False)
    dev = hpfx.converter_device_set(
        net, s, [{"kind": "six_pulse", "I1": 0.3}], leak=0.0)
    p = tmp_path / "conv.dss"
    export_opendss_case(net, dev, s, str(p))
    txt = p.read_text()
    assert "exact (Y_N=0)" in txt
    spec = device_spectra_at_nominal(dev, s)
    np.testing.assert_allclose(
        spec[0], hpfx.six_pulse_spectrum(s.harmonics, I1=0.3), atol=1e-7)


def test_transformer_branch_exports_as_transformer(tmp_path):
    from hpfx.network import NONLINEAR, PQ, SLACK
    s = hpfx.settings_for_hmax(9, coupled=True)
    net = hpfx.network_from_arrays(
        bus_types=(SLACK, PQ, NONLINEAR),
        components=("generator", "lin_load", "SMPS"),
        P=[0, 100, 250], Q=[0, 50, 100], X_sh=[0.005, 0, 0],
        line_from=[0, 1], line_to=[1, 2], R=[0.5, 1.0], X=[2.0, 4.0],
        tau=[1.05, 1.0], phase_shift=[30.0, 0.0],
        settings=s, per_unit=False)
    dev = hpfx.load_device_set(net, s)
    p = tmp_path / "trafo.dss"
    export_opendss_case(net, dev, s, str(p))
    txt = p.read_text()
    assert len(re.findall(r"^New Transformer\.", txt, re.M)) == 1
    assert len(re.findall(r"^New Line\.", txt, re.M)) == 1
    m = re.search(r"taps=\(([\d.eE+-]+), 1\.0\)", txt)
    assert float(m.group(1)) == pytest.approx(1.05)
    assert "NOT representable" in txt          # the 30 deg shift flag
