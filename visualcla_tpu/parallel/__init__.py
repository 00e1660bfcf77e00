from .pipeline import (  # noqa: F401
    PIPE,
    make_pipe_mesh,
    pipeline_forward,
    pipeline_kv_cache,
    shard_text_params,
    stage_param_specs,
)
from .sharding import (  # noqa: F401
    DATA,
    MODEL,
    batch_spec,
    kv_cache_specs,
    make_mesh,
    param_specs,
    shard_params,
)
