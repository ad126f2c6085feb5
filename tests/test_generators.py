"""Synthetic feeder generation + validation + arrow-vs-dense at scale."""
import time

import numpy as np
import pytest

import hpfx
from hpfx.generators import synthetic_feeder
from hpfx.network import validate_network


def test_feeder_structure_and_validation():
    s = hpfx.settings_for_hmax(9, coupled=True)
    net = synthetic_feeder(40, 10, s, components=("SMPS", "ev_4"), seed=1)
    assert (net.n, net.n_nonlinear) == (40, 10)
    validate_network(net)
    assert net.nonlinear_components[:2] == ("SMPS", "ev_4")


def test_validation_catches_disconnected():
    import dataclasses
    s = hpfx.settings_for_hmax(5)
    net = synthetic_feeder(10, 2, s, seed=0)
    # cut every line touching the last bus
    keep = (np.asarray(net.line_from) != 9) & (np.asarray(net.line_to) != 9)
    cut = dataclasses.replace(
        net,
        line_from=np.asarray(net.line_from)[keep],
        line_to=np.asarray(net.line_to)[keep],
        line_R=np.asarray(net.line_R)[keep],
        line_X=np.asarray(net.line_X)[keep],
        line_G=np.asarray(net.line_G)[keep],
        line_B=np.asarray(net.line_B)[keep],
        line_tau=np.asarray(net.line_tau)[keep],
        line_shift=np.asarray(net.line_shift)[keep])
    with pytest.raises(ValueError, match="unreachable"):
        validate_network(cut)


def test_feeder_solves_and_arrow_scales():
    """A 40-bus feeder with 10 devices at H<=13 solves in both solver
    modes to the same answer; the arrow path must not be slower than the
    dense path at this size (it does ~10x fewer flops)."""
    s = hpfx.settings_for_hmax(13, coupled=True)
    net = synthetic_feeder(40, 10, s, seed=1)
    dev = hpfx.load_device_set(net, s)

    dense = hpfx.hpf(net, dev, s)
    assert bool(dense.converged)

    t0 = time.perf_counter()
    dense2 = hpfx.hpf(net, dev, s)
    t_dense = time.perf_counter() - t0

    s_arrow = s.with_(solver="arrow")
    arrow = hpfx.hpf(net, dev, s_arrow)   # compile
    t0 = time.perf_counter()
    arrow = hpfx.hpf(net, dev, s_arrow)
    t_arrow = time.perf_counter() - t0

    assert int(arrow.n_iter) == int(dense.n_iter)
    np.testing.assert_allclose(np.asarray(arrow.V_m), np.asarray(dense.V_m),
                               atol=1e-7)
    # informational: at dim 2*7*40-2 = 558 the arrow path does ~10x fewer
    # flops; on CPU x64 both include overheads, so only sanity-check scale
    assert t_arrow < 10 * t_dense