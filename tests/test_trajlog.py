"""Trajectory-log interchange (hpfx.trajlog): the reference's V_log.json /
I_log.json pandas-table format (hcne_based_on_fuchs.py:370-372), writer and
reader."""
import json
import os

import numpy as np

import hpfx
from hpfx import cx, harmonic
from hpfx.trajlog import read_ilog, read_vlog, write_ilog, write_vlog

from conftest import REPO, make_setup

VLOG = os.path.join(REPO, "validation", "V_log.json")
ILOG = os.path.join(REPO, "validation", "I_log.json")


def test_read_reference_vlog():
    """The reader consumes the shipped reference-written golden trace."""
    V_m, V_a, harms = read_vlog(VLOG)
    assert harms == (1, 5)
    assert V_m.shape[1:] == (2, 4)
    assert not np.isnan(V_m).any()
    # the iteration-0 golden value cited in SURVEY §6
    np.testing.assert_allclose(V_m[0, 0, 3], 0.995939482, atol=1e-12)


def test_vlog_roundtrip_reference(tmp_path):
    """read -> write -> read of the reference file is exact (the writer
    reproduces the format, incl. pandas' 10-decimal rounding which is
    idempotent on already-rounded values)."""
    V_m, V_a, harms = read_vlog(VLOG)
    traj = np.stack([V_m, V_a], axis=1)            # (T, 2, H, n)
    out = str(tmp_path / "V_log.json")
    n_written = write_vlog(out, traj, harms)
    assert n_written == V_m.shape[0]
    V_m2, V_a2, harms2 = read_vlog(out)
    assert harms2 == harms
    np.testing.assert_array_equal(V_m2, V_m)
    np.testing.assert_array_equal(V_a2, V_a)


def test_vlog_schema_matches_reference(tmp_path):
    """Byte-level schema header equality with the reference file and the
    same row key set."""
    ref = json.load(open(VLOG))
    out = str(tmp_path / "V_log.json")
    write_vlog(out, np.zeros((1, 2, 2, 4)), (1, 5))
    mine = json.load(open(out))
    assert mine["schema"] == ref["schema"]
    assert set(mine["data"][0]) == set(ref["data"][0])


def test_write_solver_trajectory_roundtrip(tmp_path):
    """An actual hpfx solve's recorded trajectory exports and reloads:
    reload equals the recorded states to the 10-decimal rounding."""
    s, net, dev = make_setup(("net2", 5, True))
    res = hpfx.hpf(net, dev, s, record_trajectory=True)
    traj = np.asarray(res.trajectory)
    out = str(tmp_path / "vlog.json")
    n_written = write_vlog(out, traj, s.harmonics)
    assert n_written == int(res.n_iter) + 1
    V_m, V_a, harms = read_vlog(out)
    assert harms == s.harmonics
    np.testing.assert_allclose(V_m, traj[:n_written, 0], atol=5e-11)
    np.testing.assert_allclose(V_a, traj[:n_written, 1], atol=5e-11)


def test_nan_padding_dropped(tmp_path):
    """NaN-padded rows past the converged iteration are not written."""
    traj = np.full((6, 2, 2, 3), np.nan)
    traj[:3] = 1.25
    out = str(tmp_path / "v.json")
    assert write_vlog(out, traj, (1, 5)) == 3
    V_m, _, _ = read_vlog(out)
    assert V_m.shape[0] == 3


def test_ilog_roundtrip_reference(tmp_path):
    inj, harms = read_ilog(ILOG)
    assert harms == (1, 5)
    out = str(tmp_path / "I_log.json")
    assert write_ilog(out, inj, harms) == inj.shape[0]
    inj2, harms2 = read_ilog(out)
    assert harms2 == harms
    np.testing.assert_array_equal(inj2, inj)
    ref = json.load(open(ILOG))
    mine = json.load(open(out))
    assert mine["schema"]["primaryKey"] == ref["schema"]["primaryKey"]


def test_ilog_from_solver_injections(tmp_path):
    """Injections computed from a recorded trajectory export in the
    reference's I_log format (single-device net2 case)."""
    from hpfx.trajlog import trajectory_injections
    s, net, dev = make_setup(("net2", 5, True))
    res = hpfx.hpf(net, dev, s, record_trajectory=True)
    traj = np.asarray(res.trajectory)
    T = int(res.n_iter) + 1
    inj_all = trajectory_injections(traj, dev, net.m)   # (T, n_nl, H)
    assert inj_all.shape == (T, 1, s.n_harmonics)
    # cross-check one state against a direct evaluation
    V = cx.polar(np.asarray(traj[0, 0]), np.asarray(traj[0, 1]))
    I0 = harmonic.current_injections(V, dev, net.m).to_numpy()
    np.testing.assert_allclose(inj_all[0], I0, atol=1e-14)
    inj = inj_all[:, 0, :]
    out = str(tmp_path / "ilog.json")
    assert write_ilog(out, inj, s.harmonics) == T
    inj2, _ = read_ilog(out)
    np.testing.assert_allclose(inj2, inj, atol=5e-11)
