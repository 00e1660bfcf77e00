from .sharding import (  # noqa: F401
    DATA,
    MODEL,
    batch_spec,
    kv_cache_specs,
    make_mesh,
    param_specs,
    shard_params,
)
