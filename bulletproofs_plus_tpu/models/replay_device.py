"""Device-side Fiat-Shamir challenge replay (verifier pass 1) — one jit.

The numpy replay (range_proof._replay_challenges) advances B sponges on the
host at ~50ms per 256-proof batch; this kernel runs the identical Merlin op
sequence (models/transcripts.py framing over utils/jstrobe.py) inside ONE
jitted program: commitments, proof elements and responses stream in as byte
arrays, challenges come out as canonical scalar limbs, already device-
resident for the scalar pass — no host crypto and no int round-trips.

Replaces the host half of /root/reference/src/range_proof.rs:816-850 (the
per-proof challenge replay with NullRng) for the device engine.

Validation parity: identity points appended to the transcript and zero
challenges are detected in-kernel and returned as flags; the caller raises
`VerificationFailed` with the reference messages (transcript_protocol.rs
identity rejection; transcripts.rs zero-challenge rejection) before any
pass-2 work, preserving error precedence.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import field as F
from ..utils.jstrobe import JStrobe, JTranscript
from .transcripts import DOMAIN_SEPARATOR

__all__ = ["replay_fn", "pack_replay_inputs"]


def _bytes_to_limbs(data: jnp.ndarray) -> jnp.ndarray:
    """(..., 2k) uint8 LE -> (..., k) uint32 limbs (radix 2^16), traced."""
    lo = data[..., 0::2].astype(jnp.uint32)
    hi = data[..., 1::2].astype(jnp.uint32)
    return lo | (hi << jnp.uint32(8))


def _wide_to_scalar(wide: jnp.ndarray) -> jnp.ndarray:
    """(B, 64) uint8 -> (B, 16) canonical limbs via wide Barrett reduction."""
    return F.reduce_wide_l(_bytes_to_limbs(wide))


def _is_all_zero(data: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(data == 0, axis=-1)


def row_layout(m: int, rounds: int, deg: int):
    """Static byte layout of one proof's packed row:
    [commits | min_vals | a | a1 | b | li | ri | r1 | s1 | d1]."""
    sizes = {
        "commits": m * 32,
        "min_vals": m * 8,
        "a": 32,
        "a1": 32,
        "b": 32,
        "li": rounds * 32,
        "ri": rounds * 32,
        "r1": 32,
        "s1": 32,
        "d1": deg * 32,
    }
    offsets = {}
    off = 0
    for name, size in sizes.items():
        offsets[name] = (off, off + size)
        off += size
    return offsets, off


def unpack_row_buffer(buf: jnp.ndarray, m: int, rounds: int, deg: int):
    """Slice a (B, stride) packed row buffer back into its fields (traced,
    static offsets — free inside jit)."""
    offsets, stride = row_layout(m, rounds, deg)
    assert buf.shape[-1] == stride

    def f(name, *shape):
        lo, hi = offsets[name]
        out = buf[:, lo:hi]
        return out.reshape(buf.shape[0], *shape) if shape else out

    return dict(
        commits=f("commits", m, 32),
        min_vals=f("min_vals", m, 8),
        a=f("a"),
        a1=f("a1"),
        b=f("b"),
        li=f("li", rounds, 32),
        ri=f("ri", rounds, 32),
        r1=f("r1"),
        s1=f("s1"),
        d1=f("d1", deg, 32),
    )


@functools.lru_cache(maxsize=None)
def replay_fn(
    h_base_compressed: bytes,
    g_bases_compressed: Tuple[bytes, ...],
    bit_length: int,
    extension_degree: int,
    m: int,
    rounds: int,
    pos: int,
    pos_begin: int,
    cur_flags: int,
):
    """Build (and cache) the jitted replay for one proof shape + generator set
    + initial transcript position.

    Returned fn(state (B,200)u8, buf (B,stride)u8 per row_layout)
      -> (y, z (B,16), es (B,rounds,16), e (B,16) canonical limbs,
          seeds (B,32) u8, bad_identity (B,) bool, bad_zero (B,) bool)
    """

    @jax.jit
    def replay(state, buf):
        fields = unpack_row_buffer(buf, m, rounds, extension_degree)
        commits, min_vals = fields["commits"], fields["min_vals"]
        a, a1, b = fields["a"], fields["a1"], fields["b"]
        li, ri = fields["li"], fields["ri"]
        r1, s1, d1 = fields["r1"], fields["s1"], fields["d1"]
        t = JTranscript(JStrobe(state, pos, pos_begin, cur_flags))
        bad_identity = jnp.zeros(state.shape[0], dtype=bool)
        bad_zero = jnp.zeros(state.shape[0], dtype=bool)

        def validate_append(label, point):
            nonlocal bad_identity
            bad_identity = bad_identity | _is_all_zero(point)
            t.append_message(label, point)

        def challenge(label):
            nonlocal bad_zero
            s = _wide_to_scalar(t.challenge_bytes(label, 64))
            bad_zero = bad_zero | F.is_zero_l(s)
            return s

        # RangeProofTranscript.__init__ sequence (models/transcripts.py)
        t.append_message(b"dom-sep", DOMAIN_SEPARATOR)
        t.append_message(b"H", h_base_compressed)  # valid by construction
        for g in g_bases_compressed:
            t.append_message(b"G", g)
        t.append_u64(b"N", bit_length)
        t.append_u64(b"T", extension_degree)
        t.append_u64(b"M", m)
        for j in range(m):
            t.append_message(b"Ci", commits[:, j])
        for j in range(m):
            t.append_u64(b"vi - minimum_value", min_vals[:, j])

        # challenges_y_z
        validate_append(b"A", a)
        y = challenge(b"y")
        z = challenge(b"z")

        es = []
        for j in range(rounds):
            validate_append(b"L", li[:, j])
            validate_append(b"R", ri[:, j])
            es.append(challenge(b"e"))
        es = jnp.stack(es, axis=1)

        validate_append(b"A1", a1)
        validate_append(b"B", b)
        e = challenge(b"e")

        # to_verifier_rng: bind r1, s1, d1; final RNG seeded with NullRng
        t.append_message(b"r1", r1)
        t.append_message(b"s1", s1)
        for k in range(d1.shape[1]):
            t.append_message(b"d1", d1[:, k])
        seeds = t.build_rng().finalize_null().fill_bytes(32)

        return y, z, es, e, seeds, bad_identity, bad_zero

    return replay


def pack_replay_inputs(statements, proofs) -> np.ndarray:
    """Pack the whole batch into ONE (B, stride) uint8 buffer (row_layout
    order) — a single host->device transfer feeds both the replay kernel and
    the fused verify kernel.  Pure byte joins; the only per-int work is the
    response scalars' to_bytes."""
    from ..ops import host_ristretto as hr

    B = len(proofs)
    m = len(statements[0].commitments)
    rounds = len(proofs[0].li)
    deg = len(proofs[0].d1)
    _, stride = row_layout(m, rounds, deg)

    rows = []
    for s, p in zip(statements, proofs):
        rows.append(b"".join(s.commitments_compressed))
        rows.append(
            b"".join((v or 0).to_bytes(8, "little") for v in s.minimum_value_promises)
        )
        rows.append(p.a)
        rows.append(p.a1)
        rows.append(p.b)
        rows.append(b"".join(p.li))
        rows.append(b"".join(p.ri))
        rows.append(hr.scalar_to_bytes(p.r1))
        rows.append(hr.scalar_to_bytes(p.s1))
        rows.append(b"".join(hr.scalar_to_bytes(v) for v in p.d1))
    return np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(B, stride)
