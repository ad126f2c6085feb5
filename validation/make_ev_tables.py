"""Generate EV-charger Norton-equivalent tables with the hpfx simulator.

The reference ships only smps_NE.csv; its EV circuits (EV1.mdl / EV_X.mdl +
the Collin parameter tables in sim_FFT.m:37-88) were never exported.  This
script runs the full hpfx L0->L1 chain for each EV model (including the
3-phase EV_5, characterized per phase) and writes hpfx/data/<model>_NE.csv
tables loadable by the solver, covering the reference's full measurement
range 150..5050 Hz (sim_FFT.m:20-22) — harmonics up to h=101, a superset
of the shipped smps_NE.csv's h<=99.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from hpfx.ne_pipeline import export_ne_csv, fit_norton_from_measurements  # noqa: E402
from hpfx.simulate import characterize_rectifier, ev_params, ev_protocol  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "hpfx", "data")

for model in ("EV_1", "EV_2", "EV_4", "EV_5"):
    ms = characterize_rectifier(ev_params(model), ev_protocol(model, substeps=8))
    fit = fit_norton_from_measurements(ms)
    path = os.path.join(OUT, f"{model.lower()}_NE.csv")
    export_ne_csv(fit, path)
    print(f"{model}: self-test uc={fit.err_uncoupled:.2e} "
          f"c={fit.err_coupled:.2e} passed={fit.passed} -> {path}")
