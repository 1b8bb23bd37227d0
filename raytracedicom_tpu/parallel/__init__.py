from . import multihost
from .sharding import (
    FIELD_AXIS,
    RAY_AXIS,
    batch_sharding,
    make_mesh,
    make_sharded_dose_fn,
    make_train_step,
    ray_sharding,
    replicated,
)

__all__ = [
    "FIELD_AXIS", "RAY_AXIS", "batch_sharding", "make_mesh",
    "make_sharded_dose_fn", "make_train_step", "multihost", "ray_sharding",
    "replicated",
]
