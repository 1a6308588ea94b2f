"""Multi-chip batch verification: data-parallel over the proof batch.

The verifier's algebra distributes cleanly (SURVEY.md §2 "parallelism"):
the final check is

    sum_b [ static(b) + dynamic(b) ] == identity

so each device takes a shard of the proof batch, runs the full scalar pass,
decompression, and its dynamic MSM locally, and the cross-device combination
is two cheap collectives over ICI:

  * `psum` of the static gi/hi scalar accumulators — raw uint32 limb sums
    stay exact for up to 2^16 devices, reduced mod l after the collective;
  * `all_gather` of one partial Edwards point per device (256 B), folded
    locally.

The static fixed-base MSM runs once per device on the psum'd scalars
(replicated work, ~16 ms, cheaper than sharding its table lanes for small
static sizes).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops import edwards as ed
from ..ops import field as F
from ..ops import ristretto as rist
from ..ops.edwards import PointArray
from ..ops.limbs import NLIMBS
from .sharded_msm import _fold_gathered


_VERIFIER_CACHE: dict = {}


def sharded_verifier(mesh: Mesh, *, m: int, bit_length: int, extension_degree: int, max_mn: int):
    """Cached build_sharded_verifier (one compiled program per shape+mesh)."""
    key = (mesh, m, bit_length, extension_degree, max_mn)
    if key not in _VERIFIER_CACHE:
        _VERIFIER_CACHE[key] = build_sharded_verifier(
            mesh, m=m, bit_length=bit_length, extension_degree=extension_degree, max_mn=max_mn
        )
    return _VERIFIER_CACHE[key]


def make_dp_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devices), ("dp",))


def build_sharded_verifier(mesh: Mesh, *, m: int, bit_length: int, extension_degree: int, max_mn: int):
    """Compile a dp-sharded verify_group_full over `mesh`.

    Returns fn(packed..., tables, g_base_pts, h_base_pt) -> (ok, valid) with
    the batch axis of every packed array sharded over 'dp' (B divisible by
    mesh size).
    """
    from ..models.verifier_kernels import scalar_pass
    from ..ops.fixed_base import fixed_msm
    from ..ops.msm import msm_kernel, pad_msm_inputs

    def local(y, z, round_es, e, weight, r1, s1, d1, min_values, comp_limbs,
              tables, g_base_pts, h_base_pt):
        B = y.shape[0]  # local shard
        rounds = round_es.shape[1]
        K = m + 3 + 2 * rounds

        (gi, hi, gb, hb, commit_s, a1_s, b_s, a_s, li_s, ri_s) = scalar_pass(
            y, z, round_es, e, weight, r1, s1, d1, min_values,
            m=m, bit_length=bit_length, extension_degree=extension_degree, max_mn=max_mn,
        )
        points, valid = rist.decompress(comp_limbs)

        # Cross-device scalar accumulation: raw limb psum then one reduction
        def _psum_mod_l(x):
            raw = jax.lax.psum(x, "dp")
            return F.barrett_reduce(F.carry_prop(raw, 32))

        gi = _psum_mod_l(gi)
        hi = _psum_mod_l(hi)
        gb = _psum_mod_l(gb)
        hb = _psum_mod_l(hb[None])[0]

        # Local dynamic MSM partial (per-proof points + per-shard scalars)
        dyn_scalars = jnp.concatenate(
            [commit_s, a1_s[:, None], b_s[:, None], a_s[:, None], li_s, ri_s], axis=1
        ).reshape(B * K, NLIMBS)
        dyn_scalars, dyn_points = pad_msm_inputs(dyn_scalars, points)
        partial = msm_kernel(dyn_scalars, dyn_points)

        # Static + Pedersen half on the psum'd scalars (replicated work)
        static_scalars = jnp.stack([gi, hi], axis=1).reshape(2 * max_mn, NLIMBS)
        static_pt = fixed_msm(static_scalars, tables)
        ped_scalars, ped_points = pad_msm_inputs(
            jnp.concatenate([gb, hb[None]], axis=0),
            PointArray(*(jnp.concatenate([g, h], axis=0) for g, h in zip(g_base_pts, h_base_pt))),
        )
        ped_pt = msm_kernel(ped_scalars, ped_points)

        gathered = jax.lax.all_gather(partial, "dp")  # (D,) points
        total = ed.add(_fold_gathered(gathered), ed.add(static_pt, ped_pt))
        ok = rist.is_identity(total)
        valid_all = jax.lax.all_gather(valid, "dp").reshape(-1)
        return ok, valid_all

    spec_b = P("dp")
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spec_b, spec_b, spec_b, spec_b, spec_b, spec_b, spec_b, spec_b, spec_b, spec_b,
            PointArray(P(), P(), P(), P()),  # tables replicated
            PointArray(P(), P(), P(), P()),  # g bases
            PointArray(P(), P(), P(), P()),  # h base
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_packed(packed, mesh: Mesh):
    """Place each packed array with its batch axis sharded over 'dp'."""
    sharding = NamedSharding(mesh, P("dp"))
    return tuple(jax.device_put(a, sharding) for a in packed)
