"""Round-4 hardware probes for the Mosaic concat-layout limitation.

The real Mosaic compiler rejects conv_planes' per-term jnp.pad
(tpu.concatenate (16,W)+(15,W) -> (31,W): "result/input offset mismatch on
non-concat dimension").  This probes candidate rewrites in isolation so the
pfield fix targets a pattern the hardware compiler actually accepts:

    python scripts/pallas_probe2.py

One JSON line per probe: {"probe": ..., "ok": bool, "err"/"exact": ...}.
"""

from __future__ import annotations

import json
import os
import resource
import sys

try:
    resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

W = 128


def run(name, kernel, args, out_shape, check=None):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(fn)(*args))
        line = {"probe": name, "ok": True}
        if check is not None:
            line["exact"] = bool(check(out))
        print(json.dumps(line), flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "ok": False, "err": str(e)[:240]}), flush=True)
        return None


rs = np.random.RandomState(0)
a = jnp.asarray(rs.randint(0, 1 << 16, (16, W), dtype=np.uint32))
b = jnp.asarray(rs.randint(0, 1 << 16, (16, W), dtype=np.uint32))
an = np.asarray(a, dtype=np.uint64)
bn = np.asarray(b, dtype=np.uint64)

want_lo = np.zeros((31, W), np.uint64)
want_hi = np.zeros((31, W), np.uint64)
for i in range(16):
    for j in range(16):
        p = an[i] * bn[j]
        want_lo[i + j] += p & 0xFFFF
        want_hi[i + j] += p >> 16


# A. baseline repro: per-term jnp.pad into 31 rows (expected FAIL on Mosaic)
def k_conv_pad(a_ref, b_ref, o_ref):
    x, y = a_ref[:], b_ref[:]
    acc_lo = jnp.zeros((31, W), jnp.uint32)
    acc_hi = jnp.zeros((31, W), jnp.uint32)
    for i in range(16):
        p = x[i : i + 1, :] * y
        plo = jnp.pad(p & jnp.uint32(0xFFFF), ((i, 15 - i), (0, 0)))
        phi = jnp.pad(p >> jnp.uint32(16), ((i, 15 - i), (0, 0)))
        acc_lo = acc_lo + plo
        acc_hi = acc_hi + phi
    o_ref[:] = jnp.concatenate([acc_lo, acc_hi], axis=0)


run(
    "A_conv_pad31",
    k_conv_pad,
    (a, b),
    jax.ShapeDtypeStruct((62, W), jnp.uint32),
    lambda got: (got[:31] == want_lo).all() and (got[31:] == want_hi).all(),
)


# B. row-split halves: fixed 16-row buffers, zeros-first / zeros-last concat
def _shift_up(x, k):  # rows i -> i+k, zeros first (Kogge-Stone pattern)
    if k == 0:
        return x
    z = jnp.zeros((k, W), jnp.uint32)
    return jnp.concatenate([z, x[: 16 - k]], axis=0)


def _wrap_down(x, k):  # rows k..15 -> 0..15-k, zeros after
    if k == 0:
        return jnp.zeros((16, W), jnp.uint32)
    z = jnp.zeros((16 - k, W), jnp.uint32)
    return jnp.concatenate([x[16 - k :], z], axis=0)


def k_conv_halves(a_ref, b_ref, o_ref):
    x, y = a_ref[:], b_ref[:]
    lo_l = jnp.zeros((16, W), jnp.uint32)  # lo plane, rows 0..15
    lo_h = jnp.zeros((16, W), jnp.uint32)  # lo plane, rows 16..31
    hi_l = jnp.zeros((16, W), jnp.uint32)
    hi_h = jnp.zeros((16, W), jnp.uint32)
    for i in range(16):
        p = x[i : i + 1, :] * y
        plo = p & jnp.uint32(0xFFFF)
        phi = p >> jnp.uint32(16)
        lo_l = lo_l + _shift_up(plo, i)
        lo_h = lo_h + _wrap_down(plo, i)
        hi_l = hi_l + _shift_up(phi, i)
        hi_h = hi_h + _wrap_down(phi, i)
    o_ref[:] = jnp.concatenate([lo_l, lo_h, hi_l, hi_h], axis=0)


def _check_halves(got):
    lo = got[:16].astype(np.uint64) + np.concatenate(
        [np.zeros((16, W), np.uint64), got[16:32].astype(np.uint64)[:15]]
    )[:16]
    # reassemble 31 rows: rows 0..15 from first buffer, 16..30 from second
    full_lo = np.concatenate([got[:16], got[16:31]]).astype(np.uint64)
    full_lo[16:31] = got[16:31]
    ok_lo = (got[:16] == want_lo[:16]).all() and (got[16:31] == want_lo[16:31]).all()
    ok_hi = (got[32:48] == want_hi[:16]).all() and (got[48:63] == want_hi[16:31]).all()
    del lo
    return ok_lo and ok_hi


run(
    "B_conv_rowsplit",
    k_conv_halves,
    (a, b),
    jax.ShapeDtypeStruct((64, W), jnp.uint32),
    _check_halves,
)


# C. dynamic_update_slice accumulation into a 31-row buffer
def k_conv_dus(a_ref, b_ref, o_ref):
    x, y = a_ref[:], b_ref[:]
    acc_lo = jnp.zeros((32, W), jnp.uint32)
    for i in range(16):
        p = x[i : i + 1, :] * y
        plo = p & jnp.uint32(0xFFFF)
        cur = jax.lax.dynamic_slice(acc_lo, (i, 0), (16, W))
        acc_lo = jax.lax.dynamic_update_slice(acc_lo, cur + plo, (i, 0))
    o_ref[:] = acc_lo


run(
    "C_conv_dus",
    k_conv_dus,
    (a, b),
    jax.ShapeDtypeStruct((32, W), jnp.uint32),
    lambda got: (got[:31].astype(np.uint64) == want_lo).all(),
)


# D. pltpu.roll of a 32-row buffer (single pre-pad, then rotate per term)
def k_conv_roll(a_ref, b_ref, o_ref):
    x, y = a_ref[:], b_ref[:]
    acc_lo = jnp.zeros((32, W), jnp.uint32)
    z16 = jnp.zeros((16, W), jnp.uint32)
    for i in range(16):
        p = x[i : i + 1, :] * y
        ext = jnp.concatenate([p & jnp.uint32(0xFFFF), z16], axis=0)  # (32, W)
        acc_lo = acc_lo + pltpu.roll(ext, i, 0)
    o_ref[:] = acc_lo


run(
    "D_conv_pltpu_roll",
    k_conv_roll,
    (a, b),
    jax.ShapeDtypeStruct((32, W), jnp.uint32),
    lambda got: (got[:31].astype(np.uint64) == want_lo).all(),
)


# E. the _add_row0 pattern used by _finish_mod: concat((1,W), zeros(15,W))
def k_add_row0(a_ref, o_ref):
    x = a_ref[:]
    row = x[15:16] * jnp.uint32(38)
    z = jnp.zeros((15, W), jnp.uint32)
    o_ref[:] = x + jnp.concatenate([row, z], axis=0)


run(
    "E_add_row0",
    k_add_row0,
    (a,),
    jax.ShapeDtypeStruct((16, W), jnp.uint32),
    lambda got: (
        got.astype(np.uint64)
        == (an + np.concatenate([an[15:16] * 38, np.zeros((15, W), np.uint64)])) & 0xFFFFFFFF
    ).all(),
)


# F. zeros-first single concat of a fresh mul result (shift_rows on products)
def k_shift_of_prod(a_ref, b_ref, o_ref):
    p = a_ref[:] * b_ref[:]
    z = jnp.zeros((1, W), jnp.uint32)
    o_ref[:] = jnp.concatenate([z, p[:-1]], axis=0)


run(
    "F_shift_of_prod",
    k_shift_of_prod,
    (a, b),
    jax.ShapeDtypeStruct((16, W), jnp.uint32),
    lambda got: (
        got.astype(np.uint64)
        == np.concatenate([np.zeros((1, W), np.uint64), (an * bn)[:15] & 0xFFFFFFFF])
    ).all(),
)

print(json.dumps({"probe": "done", "ok": True}), flush=True)
