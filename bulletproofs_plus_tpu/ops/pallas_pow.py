"""Pallas (Mosaic) pow-chain kernel: x^((p-5)/8), the curve25519 sqrt-ratio
exponent (RFC 9496), with every chain intermediate VMEM-resident.

Why: `field.pow_p58` is ~254 *sequential* field ops (the `_chain_250`
addition chain), and under XLA each op's one-hot MXU limb product forces its
operands through HBM — at B=256 the verifier's batched decompress spends an
estimated ~10 ms here (CLAUDE.md round-2 profile), and the prover pays the
same chain inside every per-round `rist.compress`.  In a pallas kernel the
whole chain runs on the VPU over limb-major (16, lanes) tiles (ops/pfield.py)
and touches HBM exactly twice: one read of x, one write of the result.

The dispatch (`maybe_pow_p58_pallas`) is trace-time: TPU backend, >= 128
flattened lanes, the shared Mosaic smoke gate passing, and not inside a
GSPMD-partitioned prover trace (XLA cannot auto-partition a pallas custom
call — `no_pallas_pow()` marks those traces; shard_map traces are fine and
keep the kernel).

Replaces curve25519-dalek's `FieldElement::pow_p58` (a dependency of the
reference's decompression calls, range_proof.rs:856-866); no direct
reference counterpart — the reference runs this on scalar CPU code.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pfield as pf
from .limbs import NLIMBS

# Trace-time gate: GSPMD-meshed prover traces set this False so the custom
# call never lands in an auto-partitioned graph.
_ALLOW = True


@contextlib.contextmanager
def no_pallas_pow():
    global _ALLOW
    prev = _ALLOW
    _ALLOW = False
    try:
        yield
    finally:
        _ALLOW = prev


def _interpret() -> bool:
    from .pallas_msm import _interpret as msm_interpret

    return msm_interpret()


def _sqr_n(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jax.lax.fori_loop(0, n, lambda _, a: pf.sqr(a), x)


def _chain_250(x: jnp.ndarray):
    """Limb-major mirror of field._chain_250: (x^(2^250 - 1), x^11)."""
    z2 = pf.sqr(x)
    z9 = pf.mul(x, _sqr_n(z2, 2))
    z11 = pf.mul(z2, z9)
    z_5_0 = pf.mul(z9, pf.sqr(z11))
    z_10_0 = pf.mul(_sqr_n(z_5_0, 5), z_5_0)
    z_20_0 = pf.mul(_sqr_n(z_10_0, 10), z_10_0)
    z_40_0 = pf.mul(_sqr_n(z_20_0, 20), z_20_0)
    z_50_0 = pf.mul(_sqr_n(z_40_0, 10), z_10_0)
    z_100_0 = pf.mul(_sqr_n(z_50_0, 50), z_50_0)
    z_200_0 = pf.mul(_sqr_n(z_100_0, 100), z_100_0)
    z_250_0 = pf.mul(_sqr_n(z_200_0, 50), z_50_0)
    return z_250_0, z11


def _pow_p58_kernel(x_ref, o_ref):
    x = x_ref[:]  # (16, lc)
    z_250_0, _ = _chain_250(x)
    o_ref[:] = pf.mul(_sqr_n(z_250_0, 2), x)


@functools.partial(jax.jit, static_argnames=("lc",))
def _pow_p58_tiles(xt: jnp.ndarray, lc: int) -> jnp.ndarray:
    """xt: (16, n) limb-major, n a multiple of lc."""
    n = xt.shape[-1]
    assert n % lc == 0
    spec = pl.BlockSpec((NLIMBS, lc), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pow_p58_kernel,
        grid=(n // lc,),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32),
        in_specs=[spec],
        out_specs=spec,
        interpret=_interpret(),
    )(xt)


def pow_p58_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) limbs -> (..., 16) limbs of x^((p-5)/8)."""
    lead = x.shape[:-1]
    n = 1
    for d in lead:
        n *= int(d)
    flat = x.reshape(n, NLIMBS)
    lc = 256 if n >= 256 else 128
    target = -(-n // lc) * lc
    if target != n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((target - n, NLIMBS), jnp.uint32)], axis=0
        )
    out = _pow_p58_tiles(jnp.transpose(flat, (1, 0)), lc)
    return jnp.transpose(out, (1, 0))[:n].reshape(lead + (NLIMBS,))


def maybe_pow_p58_pallas(x: jnp.ndarray):
    """Trace-time dispatcher used by field.pow_p58; None -> XLA chain."""
    import os

    if not _ALLOW or os.environ.get("BPPT_PALLAS", "1") != "1":
        return None
    if jax.default_backend() != "tpu":
        return None
    n = 1
    for d in x.shape[:-1]:
        n *= int(d)
    if n < 128:
        return None
    from .pallas_msm import mosaic_available

    if not mosaic_available():
        return None
    return pow_p58_pallas(x)
