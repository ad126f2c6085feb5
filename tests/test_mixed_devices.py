"""Mixed device families in one network (SMPS + EV chargers) — a
capability the reference's loader supports structurally
(import_Norton_Equivalents keys NEs per unique component,
hcne_generalized.py:284-310) but never exercised, lacking EV NE tables.
The ev_*_NE.csv tables are produced by the hpfx simulator
(validation/make_ev_tables.py)."""
import numpy as np
import pytest

import hpfx

from conftest import DATA


def _net4(s):
    return hpfx.load_network(f"{DATA}/net4_buses.csv",
                             f"{DATA}/net4_lines.csv", s)


@pytest.mark.parametrize("coupled", [False, True])
def test_mixed_device_hpf(coupled):
    s = hpfx.settings_for_hmax(9, coupled=coupled)
    net = _net4(s)
    assert net.n_nonlinear == 3
    assert net.nonlinear_components == ("SMPS", "ev_1", "ev_4")
    dev = hpfx.load_device_set(net, s)
    # three distinct devices resolved from three distinct tables
    I = dev.I_N.to_numpy()
    assert not np.allclose(I[0], I[1])
    assert not np.allclose(I[1], I[2])
    res = hpfx.hpf(net, dev, s)
    assert bool(res.converged)
    thd = hpfx.get_thd(res.V_m)
    assert np.all(np.isfinite(np.asarray(thd.THD_F)))
    assert float(np.max(np.asarray(thd.THD_F))) < 1.0


def test_ev_tables_cover_full_reference_range():
    """The generated EV tables span the reference's full characterization
    range 150..5050 Hz (sim_FFT.m:20-22): harmonics 1..101, a superset of
    the shipped smps_NE.csv's 1..99.  Every shipped table loads at
    settings_for_hmax(51) and at the smps table's own maximum h=99."""
    for h_max in (51, 99):
        s = hpfx.settings_for_hmax(h_max, coupled=True)
        H = s.n_harmonics
        for table in ("ev_1", "ev_2", "ev_4", "ev_5", "smps"):
            I, Y = hpfx.load_norton_equivalent(
                f"{DATA}/{table}_NE.csv", s, coupled=True)
            assert I.shape == (H,), (table, h_max)
            assert Y.shape == (H, H), (table, h_max)
            assert np.all(np.isfinite(I)) and np.all(np.isfinite(Y))
    # the EV tables reach h=101; beyond that the loader refuses cleanly
    s101 = hpfx.settings_for_hmax(101, coupled=True)
    I, Y = hpfx.load_norton_equivalent(f"{DATA}/ev_4_NE.csv", s101,
                                       coupled=True)
    assert Y.shape == (51, 51)
    with pytest.raises(ValueError, match="no Norton data"):
        hpfx.load_norton_equivalent(
            f"{DATA}/ev_4_NE.csv", hpfx.settings_for_hmax(103), coupled=True)
