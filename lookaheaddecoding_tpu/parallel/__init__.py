from .sharding import (
    kv_cache_spec, make_mesh, make_multihost_mesh, param_specs, shard_params)
