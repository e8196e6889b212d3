from .sharding import (
    PRED_AXIS, SHARD_AXIS, make_mesh, place_model, shard_design,
    shard_model,
)
from . import distributed
