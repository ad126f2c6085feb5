"""MATPOWER case import (hpfx/matpower.py)."""
import warnings

import numpy as np
import pytest

import hpfx
from hpfx.matpower import load_matpower, parse_matpower
from hpfx.network import NONLINEAR, PQ, PV, SLACK

CASE = """\
function mpc = case4hpfx
% a small 4-bus case exercising every mapped feature
mpc.version = '2';
mpc.baseMVA = 100;

%% bus data
%	bus_i	type	Pd	Qd	Gs	Bs	area	Vm	Va	baseKV	zone	Vmax	Vmin
mpc.bus = [
	4	1	25	10	0	0	1	1	0	0.4	1	1.1	0.9;  % becomes nonlinear
	1	3	0	0	0	0	1	1	0	0.4	1	1.1	0.9;
	3	1	10	10	0	0	1	1	0	0.4	1	1.1	0.9;
	2	2	5	0	0	0	1	1	0	0.4	1	1.1	0.9;
];

%% generator data
%	bus	Pg	Qg	Qmax	Qmin	Vg	mBase	status	Pmax	Pmin
mpc.gen = [
	2	25	0	300	-300	1	100	1	250	10;
	2	0	0	300	-300	1	100	0	250	10;  % out of service
];

%% branch data
%	fbus	tbus	r	x	b	rateA	rateB	rateC	ratio	angle	status
mpc.branch = [
	1	2	0.003	0.006	0.002	250	250	250	0	0	1;
	2	3	0.006	0.024	0	250	250	250	1.05	2.5	1;
	3	4	0.003	0.006	0	250	250	250	0	0	1;
	1	4	0.05	0.20	0	250	250	250	0	0	0;  % out of service
];
"""


@pytest.fixture()
def case_path(tmp_path):
    p = tmp_path / "case4hpfx.m"
    p.write_text(CASE)
    return str(p)


def test_parse_raw_matrices(case_path):
    mpc = parse_matpower(case_path)
    assert mpc["baseMVA"] == 100.0
    assert mpc["bus"].shape == (4, 13)
    assert mpc["gen"].shape == (2, 10)
    assert mpc["branch"].shape == (4, 11)
    # comments stripped, rows in file order
    assert mpc["bus"][0, 0] == 4.0 and mpc["bus"][1, 1] == 3.0


def test_load_maps_conventions(case_path):
    s = hpfx.settings_for_hmax(5, coupled=False)
    net = load_matpower(case_path, s, nonlinear={4: "SMPS"})
    # re-sorted: slack(1), PV(2), PQ(3), nonlinear(4)
    assert net.bus_types == (SLACK, PV, PQ, NONLINEAR)
    assert net.components == ("generator", "gen_2", "load_3", "SMPS")
    assert net.n == 4 and net.m == 3 and net.c == 2
    # load sign: P>0 load; PV bus nets PD - PG = 5 - 25 = -20 MW
    np.testing.assert_allclose(np.asarray(net.bus_P),
                               [0.0, -0.2, 0.1, 0.25])
    np.testing.assert_allclose(np.asarray(net.bus_Q),
                               [0.0, 0.0, 0.1, 0.1])
    # branches: status-0 dropped, endpoints remapped to sorted order
    assert len(np.asarray(net.line_R)) == 3
    np.testing.assert_array_equal(np.asarray(net.line_from), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(net.line_to), [1, 2, 3])
    # tap=0 -> 1.0; explicit tap/angle carried (degrees -> radians)
    np.testing.assert_allclose(np.asarray(net.line_tau), [1.0, 1.05, 1.0])
    np.testing.assert_allclose(np.asarray(net.line_shift),
                               [0.0, np.deg2rad(2.5), 0.0])
    np.testing.assert_allclose(np.asarray(net.line_B), [0.002, 0.0, 0.0])


def test_loaded_case_solves_end_to_end(case_path):
    s = hpfx.settings_for_hmax(5, coupled=True)
    # without a grid Thevenin reactance the harmonic network floats
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_matpower(case_path, s, nonlinear={4: "SMPS"})
    assert any("ungrounded" in str(x.message) for x in w)
    # grid short-circuit reactance at net2's scale (0.005 ohm / Z_base)
    xg = 0.005 / s.base_impedance
    net = load_matpower(case_path, s, nonlinear={4: "SMPS"},
                        slack_xsh=xg)
    assert float(np.asarray(net.bus_Xsh)[0]) == pytest.approx(xg)
    dev = hpfx.load_device_set(net, s)
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    assert float(res.V_m[0].min()) > 0.5


def test_bs_and_vg_warnings(tmp_path):
    s = hpfx.settings_for_hmax(5, coupled=False)
    txt = CASE.replace("	3	1	10	10	0	0	",
                       "	3	1	10	10	0	30	")
    txt = txt.replace("	2	25	0	300	-300	1	",
                      "	2	25	0	300	-300	1.02	")
    p = tmp_path / "case_warn.m"
    p.write_text(txt)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        net = load_matpower(str(p), s)
    msgs = " | ".join(str(x.message) for x in w)
    assert "BS mapped to X_sh" in msgs and "VG=1.02" in msgs
    # X_sh = -1/(BS/base) = -1/0.3 at the sorted position of bus 3:
    # stable type-sort of file order (4, 1, 3, 2) with NO nonlinear map
    # puts the PQ buses in file order -> bus 4 at 2, bus 3 at 3
    k = 3
    np.testing.assert_allclose(float(np.asarray(net.bus_Xsh)[k]),
                               -1.0 / 0.3, rtol=1e-12)


def test_error_paths(tmp_path, case_path):
    s = hpfx.settings_for_hmax(5, coupled=False)
    with pytest.raises(ValueError, match="unknown bus IDs"):
        load_matpower(case_path, s, nonlinear={99: "SMPS"})
    p = tmp_path / "noref.m"
    p.write_text(CASE.replace("	1	3	0	0", "	1	1	0	0"))
    with pytest.raises(ValueError, match="no reference"):
        load_matpower(str(p), s)
    p2 = tmp_path / "notmp.m"
    p2.write_text("x = 1;")
    with pytest.raises(ValueError, match="baseMVA"):
        parse_matpower(str(p2))
