"""Per-iteration trajectory logs in the reference's interchange format.

The reference records golden per-iteration solver traces as pandas
``orient="table"`` JSON (``hcne_based_on_fuchs.py:370-372`` writes
``V_log.json``/``I_log.json``; ``norton_parameters_fuchs.py:31`` re-reads
them as virtual measurements).  hpfx records trajectories natively
(``solve_harmonic(record_trajectory=True)`` -> ``HPFResult.trajectory``);
this module exports/imports them in the same on-disk format so hpfx runs
interoperate with the reference's tooling:

- ``write_vlog``: (T, 2, H, n) trajectory -> V_log.json rows
  {iteration, harmonic, bus, V_m, V_a} with the pandas table schema header.
- ``read_vlog``: the inverse (accepts both reference-written and
  hpfx-written files).
- ``write_ilog``/``read_ilog``: single-device injection traces
  {iteration, harmonic, "0": re, "1": im} (the Fuchs-example format).

Numbers are rounded to 10 decimals, matching pandas ``to_json``'s default
``double_precision`` in the shipped golden files.
"""
from __future__ import annotations

import json
from typing import Optional, Sequence, Tuple

import numpy as np

_VLOG_SCHEMA = {
    "fields": [
        {"name": "iteration", "type": "integer"},
        {"name": "harmonic", "type": "integer"},
        {"name": "bus", "type": "string"},
        {"name": "V_m", "type": "number"},
        {"name": "V_a", "type": "number"},
    ],
    "primaryKey": ["iteration", "harmonic", "bus"],
    "pandas_version": "0.20.0",
}

_ILOG_SCHEMA = {
    "fields": [
        {"name": "iteration", "type": "integer"},
        {"name": "harmonic", "type": "integer"},
        {"name": 0, "type": "number"},
        {"name": 1, "type": "number"},
    ],
    "primaryKey": ["iteration", "harmonic"],
    "pandas_version": "0.20.0",
}


def _r10(x: float) -> float:
    return round(float(x), 10)


def write_vlog(path: str, trajectory, harmonics: Sequence[int],
               n_iter: Optional[int] = None) -> int:
    """Write an hpfx trajectory as a reference-format ``V_log.json``.

    ``trajectory``: (T, 2, H, n) array — axis 1 is (V_m, V_a) — as produced
    by ``solve_harmonic(record_trajectory=True)`` (row 0 is the
    post-fundamental initial state, row t the state after NR iteration t,
    NaN-padded past the converged iteration).  ``harmonics``: the harmonic
    orders (Settings.harmonics).  ``n_iter``: keep rows 0..n_iter; by
    default NaN-padded rows are dropped.  Buses are named ``bus1..busN``
    (the reference's 1-based naming).  Returns the number of iterations
    written.
    """
    traj = np.asarray(trajectory)
    if traj.ndim != 4 or traj.shape[1] != 2:
        raise ValueError(f"trajectory must be (T, 2, H, n), got {traj.shape}")
    T, _, H, n = traj.shape
    if len(harmonics) != H:
        raise ValueError(
            f"harmonics has {len(harmonics)} entries for H={H} trajectory")
    # clamp to the last valid (non-NaN) row even when an explicit n_iter
    # overshoots: serializing NaN would emit bare `NaN` tokens (json's
    # allow_nan default), which strict parsers — including the reference
    # side's pandas read_json — reject
    valid = ~np.isnan(traj).any(axis=(1, 2, 3))
    T_valid = int(np.max(np.nonzero(valid)[0])) + 1 if valid.any() else 0
    if n_iter is None:
        T_out = T_valid
    else:
        T_out = min(int(n_iter) + 1, T, T_valid)
    rows = []
    for it in range(T_out):
        for hi, h in enumerate(harmonics):
            for b in range(n):
                rows.append({
                    "iteration": it, "harmonic": int(h),
                    "bus": f"bus{b + 1}",
                    "V_m": _r10(traj[it, 0, hi, b]),
                    "V_a": _r10(traj[it, 1, hi, b]),
                })
    with open(path, "w") as fh:
        json.dump({"schema": _VLOG_SCHEMA, "data": rows}, fh,
                  separators=(",", ":"))
    return T_out


def read_vlog(path: str) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...]]:
    """Read a ``V_log.json`` (reference- or hpfx-written).

    Returns ``(V_m (T, H, n), V_a (T, H, n), harmonics)`` with iterations,
    harmonics, and buses sorted ascending (buses by their numeric suffix).
    Missing entries (absent from the log) read as NaN.
    """
    d = json.load(open(path))
    data = d["data"]
    iters = sorted({r["iteration"] for r in data})
    harms = sorted({r["harmonic"] for r in data})
    buses = sorted({r["bus"] for r in data}, key=lambda s: int(s[3:]))
    it_ix = {v: i for i, v in enumerate(iters)}
    h_ix = {v: i for i, v in enumerate(harms)}
    b_ix = {v: i for i, v in enumerate(buses)}
    V_m = np.full((len(iters), len(harms), len(buses)), np.nan)
    V_a = np.full_like(V_m, np.nan)
    for r in data:
        i, h, b = it_ix[r["iteration"]], h_ix[r["harmonic"]], b_ix[r["bus"]]
        V_m[i, h, b] = r["V_m"]
        V_a[i, h, b] = r["V_a"]
    return V_m, V_a, tuple(harms)


def write_ilog(path: str, injections, harmonics: Sequence[int]) -> int:
    """Write a single-device injection trace as reference-format
    ``I_log.json``: ``injections`` is (T, H) complex (or a (T, H) Cx
    ``.to_numpy()``), rows {iteration, harmonic, "0": Re, "1": Im}."""
    inj = np.asarray(injections)
    if inj.ndim != 2:
        raise ValueError(f"injections must be (T, H), got {inj.shape}")
    T, H = inj.shape
    if len(harmonics) != H:
        raise ValueError(
            f"harmonics has {len(harmonics)} entries for H={H} injections")
    rows = []
    for it in range(T):
        if np.isnan(inj[it]).any():
            break
        for hi, h in enumerate(harmonics):
            rows.append({
                "iteration": it, "harmonic": int(h),
                "0": _r10(inj[it, hi].real), "1": _r10(inj[it, hi].imag),
            })
    n_written = rows[-1]["iteration"] + 1 if rows else 0
    with open(path, "w") as fh:
        json.dump({"schema": _ILOG_SCHEMA, "data": rows}, fh,
                  separators=(",", ":"))
    return n_written


def trajectory_injections(trajectory, devices, m: int) -> np.ndarray:
    """Per-iteration device injections from a recorded trajectory.

    ``trajectory``: (T, 2, H, n) as recorded by
    ``solve_harmonic(record_trajectory=True)``; ``devices`` a DeviceSet or
    AnalyticDeviceSet; ``m`` the first nonlinear bus.  Returns complex
    (T_valid, n_nl, H) — the quantity the reference logs per iteration
    into I_log.json (hcne_based_on_fuchs.py:370-372); pass
    ``out[:, d, :]`` of a single device to :func:`write_ilog`.
    """
    import jax.numpy as jnp

    from . import cx as _cx
    from .harmonic import current_injections

    traj = np.asarray(trajectory)
    rows = []
    for t in range(traj.shape[0]):
        if np.isnan(traj[t]).any():
            break
        V_m, V_a = jnp.asarray(traj[t, 0]), jnp.asarray(traj[t, 1])
        V = _cx.polar(V_m, V_a)
        I = current_injections(V, devices, m, V_m, V_a)
        rows.append(I.to_numpy())
    return np.stack(rows) if rows else np.zeros((0, 0, 0), complex)


def read_ilog(path: str) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """Read an ``I_log.json`` -> (injections (T, H) complex, harmonics)."""
    d = json.load(open(path))
    data = d["data"]
    iters = sorted({r["iteration"] for r in data})
    harms = sorted({r["harmonic"] for r in data})
    it_ix = {v: i for i, v in enumerate(iters)}
    h_ix = {v: i for i, v in enumerate(harms)}
    inj = np.full((len(iters), len(harms)), np.nan, complex)
    for r in data:
        inj[it_ix[r["iteration"]], h_ix[r["harmonic"]]] = \
            r["0"] + 1j * r["1"]
    return inj, tuple(harms)
