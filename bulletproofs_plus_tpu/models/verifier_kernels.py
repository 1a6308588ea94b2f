"""Device (JAX) batch-verification pipeline — the flagship TPU path.

Implements the verifier's pass-2 scalar accumulation and final folded MSM
(/root/reference/src/range_proof.rs:856-1062) as fixed-shape jitted kernels:

  * one `scalar_pass` jit per proof shape (m, bit_length, extension_degree)
    computing every per-proof scalar — challenge inversions (Fermat),
    the s-vector via its bit-product closed form, inverse-power ladders via
    binary decomposition (log2(mn) vector muls instead of a length-mn scan),
    gi/hi generator accumulators, and all dynamic MSM scalars;
  * one batched Ristretto decompression over every dynamic proof point;
  * one giant MSM ladder against the identity.

Fiat-Shamir challenge replay (pass 1) stays on host — it is inherently
sequential Keccak sponge work, already numpy-batched across proofs.

All scalars are (..., 16) uint32 limb arrays mod l; math comes from
ops.field (Barrett reduction).  Shapes are static per (m, n, degree) group,
so XLA compiles one program per shape — the shape space is tiny
(SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import field as F
from ..ops import host_ristretto as hr
from ..ops import ristretto as rist
from ..ops.edwards import PointArray
from ..ops.limbs import NLIMBS, limbs_from_bytes, limbs_from_int, pack_ints
from ..ops.msm import msm_kernel, pad_msm_inputs
from ..utils.deepstack import deep_jit

L = hr.L


def _const(value: int) -> jnp.ndarray:
    return jnp.asarray(limbs_from_int(value % L), dtype=jnp.uint32)


_ONE = limbs_from_int(1)


def _inv_l(x: jnp.ndarray) -> jnp.ndarray:
    return F.pow_l(x, L - 2)


def _batch_invert(x: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion over axis 1: (B, k, 16) -> (B, k, 16).

    The `Scalar::batch_invert` analog (range_proof.rs:897-905): k-1 prefix
    products, ONE Fermat inversion of the total, then back-substitution —
    ~3 multiplies per element instead of a 253-step square-and-multiply
    each.  Inputs must be nonzero (the zero-challenge rejection upstream
    guarantees it); a zero input poisons its whole lane, same as dalek.
    """
    k = x.shape[1]
    if k == 1:
        return _inv_l(x)
    prefix = [x[:, 0]]
    for j in range(1, k):
        prefix.append(F.mul_l(prefix[-1], x[:, j]))
    acc = _inv_l(prefix[-1])  # one Fermat for the whole chain
    outs: list = [None] * k
    for j in range(k - 1, 0, -1):
        outs[j] = F.mul_l(acc, prefix[j - 1])
        acc = F.mul_l(acc, x[:, j])
    outs[0] = acc
    return jnp.stack(outs, axis=1)


def _pow_static(x: jnp.ndarray, exp: int) -> jnp.ndarray:
    return F.pow_l(x, exp) if exp > 1 else (x if exp == 1 else jnp.broadcast_to(_const(1), x.shape))


def _index_bit_products(base_prod: jnp.ndarray, factors: jnp.ndarray, mn: int) -> jnp.ndarray:
    """s[i] = base_prod * prod_{bit b set in i} factors[:, rounds-1-b].

    base_prod: (B, 16); factors: (B, rounds, 16) -> (B, mn, 16).
    One lax.scan over bit positions (log2(mn) steps, single multiply body).
    """
    rounds = factors.shape[1]
    assert mn == 1 << rounds
    B = base_prod.shape[0]
    out0 = jnp.broadcast_to(base_prod[:, None, :], (B, mn, NLIMBS))
    idx = np.arange(mn)
    masks = jnp.asarray(
        np.stack([(idx >> b) & 1 == 1 for b in range(rounds)])
    )  # (rounds, mn)
    # factor for bit b is factors[:, rounds-1-b]
    xs = (masks, jnp.flip(factors, axis=1).transpose(1, 0, 2))  # (rounds, mn), (rounds, B, 16)

    def body(out, x):
        mask, factor = x
        mult = F.mul_l(out, factor[:, None, :])
        return F.select(jnp.broadcast_to(mask[None, :], out.shape[:-1]), mult, out), None

    out, _ = jax.lax.scan(body, out0, xs)
    return out


def _power_ladder(base: jnp.ndarray, start: jnp.ndarray, mn: int) -> jnp.ndarray:
    """out[:, i] = start * base^i for i in 0..mn — binary decomposition as a
    lax.scan over bit positions (one multiply+square body).

    base, start: (B, 16) -> (B, mn, 16).
    """
    nbits = max(1, (mn - 1).bit_length())
    B = start.shape[0]
    out0 = jnp.broadcast_to(start[:, None, :], (B, mn, NLIMBS))
    idx = np.arange(mn)
    masks = jnp.asarray(np.stack([(idx >> b) & 1 == 1 for b in range(nbits)]))  # (nbits, mn)

    def body(carry, mask):
        out, pow2 = carry
        mult = F.mul_l(out, pow2[:, None, :])
        out = F.select(jnp.broadcast_to(mask[None, :], out.shape[:-1]), mult, out)
        return (out, F.sqr_l(pow2)), None

    (out, _), _ = jax.lax.scan(body, (out0, base), masks)
    return out


@functools.partial(jax.jit, static_argnames=("m", "bit_length", "extension_degree", "max_mn"))
def scalar_pass(
    y: jnp.ndarray,  # (B, 16)
    z: jnp.ndarray,  # (B, 16)
    round_es: jnp.ndarray,  # (B, rounds, 16)
    e: jnp.ndarray,  # (B, 16)
    weight: jnp.ndarray,  # (B, 16)
    r1: jnp.ndarray,  # (B, 16)
    s1: jnp.ndarray,  # (B, 16)
    d1: jnp.ndarray,  # (B, deg, 16)
    min_values: jnp.ndarray,  # (B, m, 16) limbs (0 when absent)
    *,
    m: int,
    bit_length: int,
    extension_degree: int,
    max_mn: int,
):
    """Pass-2 scalar accumulation for one shape group of B proofs.

    Returns (gi_scalars (max_mn,16), hi_scalars (max_mn,16),
             g_base_scalars (deg,16), h_base_scalar (16,),
             commit_scalars (B,m,16), a1_s (B,16), b_s (B,16), a_s (B,16),
             li_s (B,rounds,16), ri_s (B,rounds,16)).
    """
    B = y.shape[0]
    mn = m * bit_length
    rounds = round_es.shape[1]

    # Montgomery batch inversion over [es..., y, y-1] (range_proof.rs:897-905)
    y_minus_1 = F.sub_l(y, jnp.broadcast_to(_const(1), y.shape))
    inv_in = jnp.concatenate([round_es, y[:, None], y_minus_1[:, None]], axis=1)
    inv_out = _batch_invert(inv_in)
    es_inv = inv_out[:, :rounds]
    y_inverse = inv_out[:, rounds]
    y_1_inverse = inv_out[:, rounds + 1]

    # prod of challenge inverses
    ch_inv_prod = jnp.broadcast_to(_const(1), y.shape)
    for j in range(rounds):
        ch_inv_prod = F.mul_l(ch_inv_prod, es_inv[:, j])

    z_square = F.sqr_l(z)
    e_square = F.sqr_l(e)
    ch_sq = F.sqr_l(round_es)
    ch_sq_inv = F.sqr_l(es_inv)
    y_nm = _pow_static(y, mn)
    y_nm_1 = F.mul_l(y_nm, y)
    one = jnp.broadcast_to(_const(1), y.shape)
    y_sum = F.mul_l(F.mul_l(y, F.sub_l(y_nm, one)), y_1_inverse)

    # d vector: d[j*n + i] = z^{2(j+1)} * 2^i  -> (B, mn, 16)
    two_pows = jnp.asarray(pack_ints([pow(2, i, L) for i in range(bit_length)]))  # (n, 16)
    z2_pows = _power_ladder(z_square, z_square, m)  # (B, m, 16): z^{2(j+1)}
    d = F.mul_l(z2_pows[:, :, None, :], two_pows[None, None, :, :]).reshape(B, mn, NLIMBS)

    # d_sum = (sum_j z^{2(j+1)}) * (2^n - 1)
    d_sum = z2_pows[:, 0]
    for j in range(1, m):
        d_sum = F.add_l(d_sum, z2_pows[:, j])
    d_sum = F.mul_l(d_sum, jnp.broadcast_to(_const(pow(2, bit_length, L) - 1), d_sum.shape))

    # s vector and its reverse
    s_vec = _index_bit_products(ch_inv_prod, ch_sq, mn)  # (B, mn, 16)
    s_rev = s_vec[:, ::-1]

    # y^{-i}, and y^{mn-i} = y^mn * y^{-i} (one ladder, one extra multiply)
    y_inv_i = _power_ladder(y_inverse, one, mn)  # (B, mn, 16)
    y_nm_i = F.mul_l(y_nm[:, None], y_inv_i)

    r1_e = F.mul_l(r1, e)
    s1_e = F.mul_l(s1, e)
    e_square_z = F.mul_l(e_square, z)

    g_term = F.add_l(F.mul_l(F.mul_l(r1_e[:, None], y_inv_i), s_vec), e_square_z[:, None])
    h_term = F.sub_l(
        F.mul_l(s1_e[:, None], s_rev),
        F.mul_l(e_square[:, None], F.add_l(F.mul_l(d, y_nm_i), z[:, None])),
    )
    gi_contrib = F.mul_l(weight[:, None], g_term)  # (B, mn, 16)
    hi_contrib = F.mul_l(weight[:, None], h_term)

    # Sum over the batch -> (mn, 16), then pad to max_mn.
    # Limb-wise uint32 sums stay exact for B <= 2^16 (limbs < 2^16), so one
    # vector sum + Barrett replaces B unrolled modular adds.
    def _batch_sum(x):
        raw = jnp.sum(x, axis=0, dtype=jnp.uint32)  # limbs < B * 2^16
        return F.barrett_reduce(F.carry_prop(raw, 32))

    gi_scalars = _batch_sum(gi_contrib)
    hi_scalars = _batch_sum(hi_contrib)
    if mn < max_mn:
        pad = jnp.zeros((max_mn - mn, NLIMBS), jnp.uint32)
        gi_scalars = jnp.concatenate([gi_scalars, pad], axis=0)
        hi_scalars = jnp.concatenate([hi_scalars, pad], axis=0)

    # Commitment scalars: -e^2 z^{2(j+1)} y^{mn+1} * weight  -> (B, m, 16)
    weighted = F.neg_l(
        F.mul_l(F.mul_l(e_square, y_nm_1)[:, None], F.mul_l(z2_pows, weight[:, None]))
    )

    # h_base: weight*(r1 y s1 + e^2(y_nm_1 z d_sum + (z^2-z) y_sum)) - sum_j weighted_j*min_j
    h_contrib = F.mul_l(
        weight,
        F.add_l(
            F.mul_l(F.mul_l(r1, y), s1),
            F.mul_l(
                e_square,
                F.add_l(
                    F.mul_l(F.mul_l(y_nm_1, z), d_sum),
                    F.mul_l(F.sub_l(z_square, z), y_sum),
                ),
            ),
        ),
    )
    min_terms = F.mul_l(weighted, min_values)  # (B, m, 16)
    for j in range(m):
        h_contrib = F.sub_l(h_contrib, min_terms[:, j])
    h_base_scalar = _batch_sum(h_contrib[:, None, :])[0]

    # g_base: weight * d1 summed over batch -> (deg, 16)
    g_base_scalars = _batch_sum(F.mul_l(weight[:, None], d1))

    # Per-proof dynamic scalars
    a1_s = F.neg_l(F.mul_l(weight, e))
    b_s = F.neg_l(weight)
    a_s = F.neg_l(F.mul_l(weight, e_square))
    w_e2 = F.neg_l(F.mul_l(weight, e_square))
    li_s = F.mul_l(w_e2[:, None], ch_sq)
    ri_s = F.mul_l(w_e2[:, None], ch_sq_inv)

    return gi_scalars, hi_scalars, g_base_scalars, h_base_scalar, weighted, a1_s, b_s, a_s, li_s, ri_s


@jax.jit
def decompress_batch(compressed_limbs: jnp.ndarray):
    """(N, 16) compressed limbs -> (PointArray, valid mask)."""
    return rist.decompress(compressed_limbs)


def _verify_group_core(
    y, z, round_es, e, weight, r1, s1, d1, min_values, comp_limbs,
    tables, g_base_pts, h_base_pt, *, m, bit_length, extension_degree, max_mn,
):
    """Shared trace body for the single-group fast paths: scalar pass,
    batched decompression, dynamic scalar assembly, and the mixed
    static+dynamic MSM identity check."""
    from ..ops.fixed_base import mixed_msm
    from ..ops.msm import pad_msm_inputs

    B = y.shape[0]
    rounds = round_es.shape[1]
    K = m + 3 + 2 * rounds

    (gi, hi, gb, hb, commit_s, a1_s, b_s, a_s, li_s, ri_s) = scalar_pass(
        y, z, round_es, e, weight, r1, s1, d1, min_values,
        m=m, bit_length=bit_length, extension_degree=extension_degree, max_mn=max_mn,
    )
    points, valid = rist.decompress(comp_limbs)

    dyn_scalars = jnp.concatenate(
        [commit_s, a1_s[:, None], b_s[:, None], a_s[:, None], li_s, ri_s], axis=1
    ).reshape(B * K, NLIMBS)
    dyn_scalars = jnp.concatenate([dyn_scalars, gb, hb[None]], axis=0)
    dyn_points = PointArray(
        *(
            jnp.concatenate([c, gpc, hpc], axis=0)
            for c, gpc, hpc in zip(points, g_base_pts, h_base_pt)
        )
    )
    dyn_scalars, dyn_points = pad_msm_inputs(dyn_scalars, dyn_points)

    static_scalars = jnp.stack([gi, hi], axis=1).reshape(2 * max_mn, NLIMBS)
    ok = rist.is_identity(mixed_msm(static_scalars, tables, dyn_scalars, dyn_points))
    return ok, valid


@deep_jit
@functools.partial(
    jax.jit, static_argnames=("m", "bit_length", "extension_degree", "max_mn")
)
def verify_group_full(
    y, z, round_es, e, weight, r1, s1, d1, min_values,
    comp_limbs,  # (B*K, 16): [commitments, a1, b, a, li, ri] per proof
    tables,  # fixed-base tables sliced to 2*max_mn lanes
    g_base_pts,  # (deg,) points
    h_base_pt,  # (1,) point
    *, m, bit_length, extension_degree, max_mn,
):
    """Single-group fast path: the ENTIRE device verification in one jit —
    one dispatch, zero eager ops.

    Returns (ok: bool, valid: (B*K,) decompression mask).
    """
    return _verify_group_core(
        y, z, round_es, e, weight, r1, s1, d1, min_values, comp_limbs,
        tables, g_base_pts, h_base_pt,
        m=m, bit_length=bit_length, extension_degree=extension_degree, max_mn=max_mn,
    )


def _u8_to_limbs(data: jnp.ndarray) -> jnp.ndarray:
    """(..., 2k) uint8 LE -> (..., k) uint32 limbs, traced."""
    lo = data[..., 0::2].astype(jnp.uint32)
    hi = data[..., 1::2].astype(jnp.uint32)
    return lo | (hi << jnp.uint32(8))


@deep_jit
@functools.partial(
    jax.jit, static_argnames=("m", "bit_length", "extension_degree", "max_mn")
)
def verify_group_bytes(
    y, z, round_es, e,  # (B,16)/(B,rounds,16) canonical limbs (device replay output)
    weight,  # (B, 16) limbs (host weight transcript)
    buf,  # (B, stride) uint8 — the SAME packed row buffer the replay consumed
    tables, g_base_pts, h_base_pt,
    *, m, bit_length, extension_degree, max_mn,
):
    """Fast-path kernel 2 for the device-replay pipeline: consumes the same
    single packed byte buffer as the replay kernel (one transfer per batch,
    no host repacking, no Python-int scalar work) plus the device-resident
    challenge limbs and host weights."""
    from .replay_device import unpack_row_buffer

    B = y.shape[0]
    rounds = round_es.shape[1]
    f = unpack_row_buffer(buf, m, rounds, extension_degree)
    r1 = _u8_to_limbs(f["r1"])
    s1 = _u8_to_limbs(f["s1"])
    d1 = _u8_to_limbs(f["d1"])
    mv = _u8_to_limbs(f["min_vals"])  # (B, m, 4)
    min_values = jnp.concatenate(
        [mv, jnp.zeros((B, m, NLIMBS - mv.shape[-1]), jnp.uint32)], axis=-1
    )
    comp = jnp.concatenate(
        [f["commits"], f["a1"][:, None], f["b"][:, None], f["a"][:, None], f["li"], f["ri"]],
        axis=1,
    )
    comp_limbs = _u8_to_limbs(comp.reshape(B * (m + 3 + 2 * rounds), 32))
    return _verify_group_core(
        y, z, round_es, e, weight, r1, s1, d1, min_values, comp_limbs,
        tables, g_base_pts, h_base_pt,
        m=m, bit_length=bit_length, extension_degree=extension_degree, max_mn=max_mn,
    )


@deep_jit
@functools.partial(
    jax.jit, static_argnames=("m", "bit_length", "extension_degree", "max_mn")
)
def group_contrib(
    y, z, round_es, e, weight, r1, s1, d1, min_values, comp_limbs,
    *, m, bit_length, extension_degree, max_mn,
):
    """One shape group's ENTIRE contribution in one dispatch: scalar pass +
    batched decompression + flattened dynamic scalars.  The mixed-shape
    verify path runs one of these per group and feeds `combine_groups_msm`
    — (#groups + 1) dispatches and ONE readback for a heterogeneous batch,
    replacing the round-2 eager per-group pipeline."""
    B = y.shape[0]
    rounds = round_es.shape[1]
    K = m + 3 + 2 * rounds
    (gi, hi, gb, hb, commit_s, a1_s, b_s, a_s, li_s, ri_s) = scalar_pass(
        y, z, round_es, e, weight, r1, s1, d1, min_values,
        m=m, bit_length=bit_length, extension_degree=extension_degree, max_mn=max_mn,
    )
    points, valid = rist.decompress(comp_limbs)
    dyn_scalars = jnp.concatenate(
        [commit_s, a1_s[:, None], b_s[:, None], a_s[:, None], li_s, ri_s], axis=1
    ).reshape(B * K, NLIMBS)
    return gi, hi, gb, hb, dyn_scalars, points, valid


@deep_jit
@jax.jit
def combine_groups_msm(
    gis, his, gbs, hbs, dyn_scalar_parts, dyn_point_parts,
    tables, g_base_pts, h_base_pt,
):
    """Closing dispatch of the mixed-shape path: sum the groups' static
    scalar accumulators, concatenate their dynamic halves, and run the one
    folded mixed MSM against the identity (range_proof.rs:1050-1062)."""
    from functools import reduce

    from ..ops.fixed_base import mixed_msm
    from ..ops.msm import pad_msm_inputs

    gi = reduce(F.add_l, gis)
    hi = reduce(F.add_l, his)
    gb = reduce(F.add_l, gbs)
    hb = reduce(F.add_l, hbs)
    max_mn = gi.shape[0]
    static_scalars = jnp.stack([gi, hi], axis=1).reshape(2 * max_mn, NLIMBS)
    dyn_scalars = jnp.concatenate(list(dyn_scalar_parts) + [gb, hb[None]], axis=0)
    dyn_points = PointArray(
        *(
            jnp.concatenate(
                [getattr(p, f) for p in dyn_point_parts]
                + [getattr(g_base_pts, f), getattr(h_base_pt, f)],
                axis=0,
            )
            for f in ("x", "y", "z", "t")
        )
    )
    dyn_scalars, dyn_points = pad_msm_inputs(dyn_scalars, dyn_points)
    return rist.is_identity(mixed_msm(static_scalars, tables, dyn_scalars, dyn_points))


@deep_jit
@jax.jit
def final_msm_is_identity(scalars: jnp.ndarray, points: PointArray) -> jnp.ndarray:
    """One folded MSM, compared against the identity."""
    return rist.is_identity(msm_kernel(scalars, points))


@deep_jit
@jax.jit
def mixed_msm_is_identity(
    static_scalars: jnp.ndarray,
    tables: PointArray,
    dynamic_scalars: jnp.ndarray,
    dynamic_points: PointArray,
) -> jnp.ndarray:
    """Static (precomputed tables) + dynamic (ladder) MSM == identity —
    the final batch-verification check (range_proof.rs:1050-1062)."""
    from ..ops.fixed_base import mixed_msm

    return rist.is_identity(
        mixed_msm(static_scalars, tables, dynamic_scalars, dynamic_points)
    )


# ---------------------------------------------------------------------------
# Host-side orchestration helpers
# ---------------------------------------------------------------------------


def _scalars_to_limbs(values: Sequence[int]) -> jnp.ndarray:
    return jnp.asarray(pack_ints([v % L for v in values]))


def _points_bytes_to_limbs(blobs: Sequence[bytes]) -> np.ndarray:
    arr = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(len(blobs), 32)
    return limbs_from_bytes(arr)


class DeviceVerifier:
    """Orchestrates the device pipeline for one same-shape group of proofs.

    Produces the group's static gi/hi scalar accumulators and its flattened
    dynamic (scalar, point) arrays; `RangeProof._verify` combines the groups
    and runs the single final MSM.
    """

    @staticmethod
    def pack(statements, proofs, challenges, weights):
        """Pack a same-shape group's scalars and compressed points into
        device arrays: returns (y, z, round_es, e, w, r1, s1, d1,
        min_values, comp_limbs)."""
        m = len(statements[0].commitments)
        rounds = len(proofs[0].li)
        B = len(proofs)

        # Plain numpy outputs: the jitted consumer transfers all arguments in
        # one go, which beats ten eager host->device transfers through the
        # TPU tunnel.
        y = pack_ints([c[0] % L for c in challenges])
        z = pack_ints([c[1] % L for c in challenges])
        round_es = pack_ints([e for c in challenges for e in c[2]]).reshape(B, rounds, 16)
        e = pack_ints([c[3] % L for c in challenges])
        w = pack_ints([v % L for v in weights])
        r1 = pack_ints([p.r1 for p in proofs])
        s1 = pack_ints([p.s1 for p in proofs])
        deg = len(proofs[0].d1)
        d1 = pack_ints([v for p in proofs for v in p.d1]).reshape(B, deg, 16)
        min_values = pack_ints(
            [v or 0 for s in statements for v in s.minimum_value_promises]
        ).reshape(B, m, 16)
        blobs: List[bytes] = []
        for statement, proof in zip(statements, proofs):
            blobs.extend(statement.commitments_compressed)
            blobs.append(proof.a1)
            blobs.append(proof.b)
            blobs.append(proof.a)
            blobs.extend(proof.li)
            blobs.extend(proof.ri)
        comp = _points_bytes_to_limbs(blobs)
        return y, z, round_es, e, w, r1, s1, d1, min_values, comp

    @staticmethod
    def raise_canonicality(valid_np: np.ndarray, m: int, rounds: int) -> None:
        """Reference-parity decompression errors, in the reference's member
        order per proof (range_proof.rs:859-866: a, a1, b, then li/ri) even
        though the packed layout is [commitments, a1, b, a, li, ri]."""
        if valid_np.all():
            return
        K = m + 3 + 2 * rounds
        per_proof = valid_np.reshape(-1, K)
        bad_proof = per_proof[~per_proof.all(axis=1)][0]
        DeviceVerifier.raise_canonicality_row(bad_proof, m, rounds)

    @staticmethod
    def raise_canonicality_row(row: np.ndarray, m: int, rounds: int) -> None:
        """One proof's decompression flags -> the reference's error, checked
        in member order a, a1, b, li/ri, commitments."""
        if row.all():
            return
        from ..errors import InvalidArgument

        for j, name in ((m + 2, "a"), (m, "a1"), (m + 1, "b")):
            if not row[j]:
                raise InvalidArgument(
                    f"Member '{name}' was not the canonical encoding of a point"
                )
        if not row[m + 3 :].all():
            raise InvalidArgument(
                "An item in member 'L' was not the canonical encoding of a point"
            )
        raise InvalidArgument("A commitment was not the canonical encoding of a point")

