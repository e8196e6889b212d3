from .sharding import make_mesh, shard_design, shard_model
