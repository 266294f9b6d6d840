from .mesh import make_mesh, initialize_distributed
from .fsdp import (fsdp_partition_specs, shard_params, make_layer_gather,
                   make_outer_gather)
from .context import (forward_flat_cp, context_parallel_log_prob,
                      make_kv_gather)
