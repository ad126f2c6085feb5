from .mesh import (scenario_mesh, shard_scenarios, hpf_sweep_sharded,
                   hosting_capacity_sharded)

__all__ = ["scenario_mesh", "shard_scenarios", "hpf_sweep_sharded",
           "hosting_capacity_sharded"]
