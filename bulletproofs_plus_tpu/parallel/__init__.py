"""Multi-chip parallelism: device meshes and sharded MSM collectives."""

from .sharded_msm import make_mesh, pad_for_mesh, sharded_msm_fn

__all__ = ["make_mesh", "pad_for_mesh", "sharded_msm_fn"]
