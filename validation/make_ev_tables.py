"""Generate EV-charger Norton-equivalent tables with the hpfx simulator.

The reference ships only smps_NE.csv; its EV circuits (EV1.mdl / EV_X.mdl +
the Collin parameter tables in sim_FFT.m:37-88) were never exported.  This
script runs the full hpfx L0->L1 chain for each EV model and writes
hpfx/data/<model>_NE.csv tables loadable by the solver, covering harmonics
up to h=49.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from hpfx.ne_pipeline import export_ne_csv, fit_norton_from_measurements  # noqa: E402
from hpfx.simulate import SweepProtocol, characterize_rectifier, ev_params  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "hpfx", "data")

proto = SweepProtocol(harm_freqs=tuple(50.0 * h for h in range(3, 50, 2)),
                      h_max=2550.0)
for model in ("EV_1", "EV_2", "EV_4"):
    ms = characterize_rectifier(ev_params(model), proto)
    fit = fit_norton_from_measurements(ms)
    path = os.path.join(OUT, f"{model.lower()}_NE.csv")
    export_ne_csv(fit, path)
    print(f"{model}: self-test uc={fit.err_uncoupled:.2e} "
          f"c={fit.err_coupled:.2e} passed={fit.passed} -> {path}")
