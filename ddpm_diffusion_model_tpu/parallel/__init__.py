from .mesh import (  # noqa: F401
    batch_sharding,
    host_local_batch_to_global,
    initialize_distributed,
    make_mesh,
    replicated,
)
from .sharding import (  # noqa: F401
    fsdp_leaf_spec,
    place_state,
    put_global,
    state_sharding,
)
from .ep import (  # noqa: F401
    ep_param_specs,
    expert_parallel_mesh,
    place_params_ep,
    shard_experts,
)
from .pp import (  # noqa: F401
    PipelinedDiT,
    dit_apply_pipelined,
    pipeline_blocks,
)
from .tp import (  # noqa: F401
    place_params_tp,
    shard_heads,
    tensor_parallel_mesh,
    tp_param_specs,
)
