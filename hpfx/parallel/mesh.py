"""Scenario-axis sharding over TPU meshes (GSPMD / jax.sharding).

The HPF scenario sweep is embarrassingly parallel (SURVEY §2.6, §5.8): the
only cross-scenario communication is the final statistics reduction of a
hosting-capacity sweep.  The design is therefore a 1-D ``Mesh`` over all
chips with the batch axis sharded (the data-parallel analogue) and the
network/device pytrees replicated; XLA inserts the ICI all-reduce for the
aggregate automatically.

Works identically on a real TPU pod slice and on the CPU-mesh simulator
(``--xla_force_host_platform_device_count=N``), which is how tests and the
driver's multi-chip dry-run validate the sharded program without hardware.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Settings
from ..devices import DeviceSet
from ..harmonic import HPFResult
from ..network import Network
from ..solve import Scenarios, SweepSummary, hosting_capacity_sweep, hpf_sweep

SCENARIO_AXIS = "scenario"


def scenario_mesh(n_devices: Optional[int] = None,
                  devices=None) -> Mesh:
    """1-D mesh over the available chips, scenario axis only."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SCENARIO_AXIS,))


def _pad_scenarios(scenarios: Scenarios, mesh: Mesh):
    """Pad the batch up to a mesh-divisible size by repeating the last
    scenario (discarded from results/aggregates by the callers).  Returns
    (padded_scenarios, original_batch)."""
    import jax.numpy as jnp

    B = scenarios.batch
    n_dev = int(np.prod(mesh.devices.shape))
    Bp = -(-B // n_dev) * n_dev
    if Bp == B:
        return scenarios, B

    def pad(x):
        if x is None:
            return None
        reps = jnp.broadcast_to(x[-1:], (Bp - B,) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    return Scenarios(*(pad(x) for x in scenarios)), B


def shard_scenarios(scenarios: Scenarios, mesh: Mesh) -> Scenarios:
    """Place scenario arrays with the batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))

    def put(x):
        return None if x is None else jax.device_put(x, sharding)

    return Scenarios(*(put(x) for x in scenarios))


def _replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def hpf_sweep_sharded(net: Network, devices: DeviceSet, settings: Settings,
                      scenarios: Scenarios, mesh: Mesh) -> HPFResult:
    """Batched HPF with the scenario axis sharded over ``mesh``.

    Batch sizes that don't divide the mesh are padded by repeating the
    last scenario; padding is sliced off the result.  Each chip runs its
    shard of scenarios independently; no collective is needed until the
    caller reduces the result.
    """
    scenarios, B = _pad_scenarios(scenarios, mesh)
    net = _replicate(net, mesh)
    devices = _replicate(devices, mesh)
    scenarios = shard_scenarios(scenarios, mesh)
    out_spec = NamedSharding(mesh, P(SCENARIO_AXIS))
    fn = jax.jit(
        partial(hpf_sweep.__wrapped__, settings=settings),
        static_argnames=(),
        out_shardings=out_spec)
    res = fn(net, devices, scenarios=scenarios)
    if res.V_m.shape[0] != B:
        res = jax.tree.map(lambda x: x[:B], res)
    return res


def hosting_capacity_sharded(net: Network, devices: DeviceSet,
                             settings: Settings, scenarios: Scenarios,
                             mesh: Mesh, thd_limit: float = 0.08
                             ) -> SweepSummary:
    """Sharded Monte-Carlo hosting-capacity sweep.

    Per-scenario outputs stay sharded; the over-limit fraction is a global
    mean XLA lowers to an ICI all-reduce.  Non-mesh-divisible batches are
    padded; padding is masked out of the aggregate and sliced off the
    per-scenario outputs.
    """
    scenarios, B = _pad_scenarios(scenarios, mesh)
    net = _replicate(net, mesh)
    devices = _replicate(devices, mesh)
    Bp = scenarios.batch
    scenarios = shard_scenarios(scenarios, mesh)
    fn = jax.jit(
        partial(hosting_capacity_sweep.__wrapped__,
                settings=settings, thd_limit=thd_limit,
                valid_count=B if Bp != B else None),
        out_shardings=(
            SweepSummary(
                max_thd_f=NamedSharding(mesh, P(SCENARIO_AXIS)),
                converged=NamedSharding(mesh, P(SCENARIO_AXIS)),
                n_iter=NamedSharding(mesh, P(SCENARIO_AXIS)),
                frac_over_limit=NamedSharding(mesh, P()),
            )))
    out = fn(net, devices, scenarios=scenarios)
    if Bp != B:
        out = SweepSummary(out.max_thd_f[:B], out.converged[:B],
                           out.n_iter[:B], out.frac_over_limit)
    return out
