"""f32 (TPU-numerics) regression tests, run on CPU.

The TPU executes everything in f32 with HIGHEST-precision matmuls; these
tests pin down that the solver still converges under f32 and stays within
the expected distance of the f64 goldens — the failure mode guarded
against is precision regressions (e.g. losing the HIGHEST matmul override,
which floors residuals at ~1e-2 and was observed on hardware).
"""
import numpy as np
import pytest

import hpfx

from conftest import load_golden, make_setup


@pytest.mark.parametrize("cfg", [("net2", 25, True), ("net3", 25, False)],
                         ids=lambda c: f"{c[0]}_h{c[1]}_{'c' if c[2] else 'uc'}")
def test_f32_convergence_and_accuracy(cfg):
    g = load_golden(cfg)
    s, _, _ = make_setup(cfg)
    s32 = s.with_(dtype="float32")
    net = hpfx.load_network(
        f"{__import__('conftest').DATA}/{cfg[0]}_buses.csv",
        f"{__import__('conftest').DATA}/{cfg[0]}_lines.csv", s32)
    dev = hpfx.load_device_set(net, s32)
    res = hpfx.hpf(net, dev, s32)
    assert bool(res.converged), float(res.err)
    # f32 solution within ~1e-4 of the f64 golden (thresh_h=1e-4 regime)
    assert np.abs(np.asarray(res.V_m) - g["V_m"]).max() < 1e-4
    # iteration count may differ by a couple under f32 rounding
    assert abs(int(res.n_iter) - int(g["n_iter_h"])) <= 4


def test_f32_fundamental_floor():
    """The fundamental threshold 1e-6 sits near the f32 noise floor; the
    solver must still terminate (converged or saturated) with a small
    residual rather than oscillate to NaN."""
    cfg = ("net2", 5, True)
    s, _, _ = make_setup(cfg)
    s32 = s.with_(dtype="float32")
    net = hpfx.load_network(
        f"{__import__('conftest').DATA}/net2_buses.csv",
        f"{__import__('conftest').DATA}/net2_lines.csv", s32)
    dev = hpfx.load_device_set(net, s32)
    res = hpfx.hpf(net, dev, s32)
    assert float(res.fund.err) < 1e-3
    assert np.isfinite(np.asarray(res.V_m)).all()
