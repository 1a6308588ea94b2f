"""Keccak-f[1600] as a traced JAX kernel — the device-side sponge.

The host layer (utils/keccak.py + native/keccak.c) serves numpy transcripts;
this module lets Fiat-Shamir hashing run INSIDE a jitted program, so the
verifier's challenge replay and the prover's per-round transcript work can
fuse with the field/point kernels into single device dispatches instead of
host<->device ping-pong (SURVEY.md §3.1: the prover is a host-device
ping-pong with log2(m*n)+2 sync points — this removes them).

Representation: a batch of sponge states is (B, 25, 2) uint32 — 25 lanes of
(lo, hi) 32-bit halves, little-endian within the lane.  TPUs have no 64-bit
integer path; every 64-bit op decomposes into two 32-bit ops (rotations pick
between-half shifts at trace time, since rotation counts are constants).

The 24 rounds run as a lax.scan so each jit call site contributes one round
body (~100 vector ops) to the graph, not 24.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Round constants as (lo, hi) uint32 pairs
_RC64 = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_RC = np.array([[rc & 0xFFFFFFFF, rc >> 32] for rc in _RC64], dtype=np.uint32)

# rho rotation offsets, by lane index x + 5y
_RHO = np.zeros(25, dtype=np.int64)
_x, _y = 1, 0
for _t in range(24):
    _RHO[_x + 5 * _y] = ((_t + 1) * (_t + 2) // 2) % 64
    _x, _y = _y, (2 * _x + 3 * _y) % 5

# pi permutation: output lane (y, 2x+3y) takes input lane (x, y);
# B[y + 5*((2x+3y)%5)] = rot(A[x + 5y]); build src index per output lane.
_PI_SRC = np.zeros(25, dtype=np.int64)
for _xx in range(5):
    for _yy in range(5):
        _PI_SRC[_yy + 5 * ((2 * _xx + 3 * _yy) % 5)] = _xx + 5 * _yy


def _rotl(lane: jnp.ndarray, n: int) -> jnp.ndarray:
    """Rotate-left a (..., 2) uint32 (lo, hi) 64-bit lane by constant n."""
    lo, hi = lane[..., 0], lane[..., 1]
    n %= 64
    if n == 0:
        return lane
    if n >= 32:
        lo, hi = hi, lo
        n -= 32
    if n == 0:
        return jnp.stack([lo, hi], axis=-1)
    nn = jnp.uint32(n)
    inv = jnp.uint32(32 - n)
    return jnp.stack([(lo << nn) | (hi >> inv), (hi << nn) | (lo >> inv)], axis=-1)


def _round(state: jnp.ndarray, rc: jnp.ndarray) -> jnp.ndarray:
    """One Keccak round on (B, 25, 2) uint32; rc: (2,) uint32."""
    a = [state[:, i] for i in range(25)]  # each (B, 2)

    # theta
    c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
    d = [c[(x + 4) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
    a = [a[i] ^ d[i % 5] for i in range(25)]

    # rho + pi
    b = [None] * 25
    for i in range(25):
        b[i] = _rotl(a[_PI_SRC[i]], int(_RHO[_PI_SRC[i]]))

    # chi
    out = [None] * 25
    for y in range(0, 25, 5):
        for x in range(5):
            out[y + x] = b[y + x] ^ (~b[y + (x + 1) % 5] & b[y + (x + 2) % 5])

    # iota
    out[0] = out[0] ^ rc[None, :]
    return jnp.stack(out, axis=1)


def keccak_f1600(state: jnp.ndarray) -> jnp.ndarray:
    """Apply the full 24-round permutation to (B, 25, 2) uint32 states."""
    rcs = jnp.asarray(_RC)

    def body(st, rc):
        return _round(st, rc), None

    out, _ = jax.lax.scan(body, state, rcs)
    return out


def bytes_to_state(data: jnp.ndarray) -> jnp.ndarray:
    """(B, 200) uint8 -> (B, 25, 2) uint32 (little-endian lanes)."""
    b = data.reshape(data.shape[0], 25, 8).astype(jnp.uint32)
    lo = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    hi = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)
    return jnp.stack([lo, hi], axis=-1)


def state_to_bytes(state: jnp.ndarray) -> jnp.ndarray:
    """(B, 25, 2) uint32 -> (B, 200) uint8."""
    lo, hi = state[..., 0], state[..., 1]
    parts = [
        (lo & 0xFF), (lo >> 8) & 0xFF, (lo >> 16) & 0xFF, (lo >> 24) & 0xFF,
        (hi & 0xFF), (hi >> 8) & 0xFF, (hi >> 16) & 0xFF, (hi >> 24) & 0xFF,
    ]
    out = jnp.stack(parts, axis=-1).astype(jnp.uint8)  # (B, 25, 8)
    return out.reshape(state.shape[0], 200)
