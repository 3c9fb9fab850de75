from libra_tpu.parallel.mesh import make_mesh
from libra_tpu.parallel.sharding import (batch_spec, param_shardings,
                                         param_specs, shard_params)

__all__ = ["make_mesh", "param_specs", "param_shardings", "shard_params",
           "batch_spec"]
