"""Multi-chip MSM: lanes sharded over a device mesh with shard_map.

The reference has no distributed backend (SURVEY.md §2: its parallelism is
algebraic batching).  The TPU-native scale-out maps the verifier's folded MSM
(/root/reference/src/range_proof.rs:1044-1062) onto a `jax.sharding.Mesh`:

  * the MSM lane axis (points/scalars) is sharded across the `mp` mesh axis;
  * each device runs the fixed-shape ladder + local tree reduction on its
    shard (pure VPU work, no communication);
  * the D partial sums — one Edwards point each, 4x16 uint32 limbs — are
    combined with one `all_gather` over ICI followed by a log-depth point
    add fold, replicated on every device.

Group elements cannot be `psum`'d (point addition is not limb-wise addition),
so the collective is an all-gather of 256-byte partials — negligible traffic
regardless of MSM size.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops import edwards as ed
from ..ops.edwards import PointArray
from ..ops.limbs import NLIMBS
from ..ops.msm import tree_reduce


def make_mesh(devices=None, axis_name: str = "mp") -> Mesh:
    """A 1-D mesh over the given (default: all) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _fold_gathered(partials: PointArray) -> PointArray:
    """Sum a (D, ...) batch of points with a log-depth fold (D power of two
    not required: odd tail handled by identity padding)."""
    n = partials.x.shape[0]
    m = 1 if n <= 1 else 1 << (n - 1).bit_length()
    if m != n:
        pad = ed.identity((m - n,))
        partials = PointArray(*(jnp.concatenate([c, p], axis=0) for c, p in zip(partials, pad)))
    return tree_reduce(partials)


def sharded_msm_fn(mesh: Mesh, axis_name: str = "mp"):
    """Build a jittable sharded MSM over `mesh`.

    Returned fn(scalars (N,16), points PointArray(N)) -> PointArray(()) with
    N divisible by mesh size and each shard a power of two.
    """

    def local_msm(scalars, points):
        per_lane = ed.scalar_mul(scalars, points)
        partial = tree_reduce(per_lane)
        gathered = jax.lax.all_gather(partial, axis_name)  # (D, 16) per coord
        return _fold_gathered(gathered)

    sharded = jax.shard_map(
        local_msm,
        mesh=mesh,
        in_specs=(P(axis_name), PointArray(P(axis_name), P(axis_name), P(axis_name), P(axis_name))),
        out_specs=PointArray(P(), P(), P(), P()),
        # The all_gather + fold leaves every device with the same point, but
        # the varying-axis checker can't infer that statically.
        check_vma=False,
    )
    return jax.jit(sharded)


def pad_for_mesh(scalars: jnp.ndarray, points: PointArray, n_shards: int):
    """Pad lanes so each of the n_shards gets a tree_reduce-compatible chunk."""
    from ..ops.msm import _reduce_width

    n = scalars.shape[0]
    per = -(-n // n_shards)
    target = _reduce_width(per) * n_shards
    if target == n:
        return scalars, points
    pad = target - n
    scalars = jnp.concatenate([scalars, jnp.zeros((pad, NLIMBS), jnp.uint32)], axis=0)
    idp = ed.identity((pad,))
    points = PointArray(*(jnp.concatenate([c, i], axis=0) for c, i in zip(points, idp)))
    return scalars, points
