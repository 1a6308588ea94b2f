"""Multi-chip parallelism: device meshes, sharded MSM collectives, and the
multi-host (pod-scale) seams."""

from .multihost import (
    global_dp_mesh,
    host_shard,
    initialize_distributed,
    make_pod_stream,
    verify_stream_pod,
)
from .sharded_msm import make_mesh, pad_for_mesh, sharded_msm_fn

__all__ = [
    "make_mesh",
    "pad_for_mesh",
    "sharded_msm_fn",
    "initialize_distributed",
    "global_dp_mesh",
    "host_shard",
    "make_pod_stream",
    "verify_stream_pod",
]
