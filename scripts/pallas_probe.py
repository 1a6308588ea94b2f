"""Probe Mosaic (pallas TPU) support for the ops the MSM kernels need:
u32 multiply, sublane-axis concatenate/pad (limb shifts), comparisons,
where-select, reshape, and halving slices.  Run on the real TPU:

    python scripts/pallas_probe.py

Prints one JSON line per probe: {"probe": ..., "ok": bool, "err": ...}.
"""

from __future__ import annotations

import json
import os
import resource

try:
    resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128


def run(name, kernel, args, out_shape):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(fn)(*args))
        print(json.dumps({"probe": name, "ok": True, "sample": out.reshape(-1)[:4].tolist()}), flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "ok": False, "err": str(e)[:300]}), flush=True)
        return None


rs = np.random.RandomState(0)
a = jnp.asarray(rs.randint(0, 1 << 16, (16, W), dtype=np.uint32))
b = jnp.asarray(rs.randint(0, 1 << 16, (16, W), dtype=np.uint32))


# 1. u32 full multiply (operands < 2^16, product up to 2^32-ish)
def k_mul(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] * b_ref[:]


got = run("u32_mul", k_mul, (a, b), jax.ShapeDtypeStruct((16, W), jnp.uint32))
if got is not None:
    want = (np.asarray(a, dtype=np.uint64) * np.asarray(b, dtype=np.uint64)) & 0xFFFFFFFF
    print(json.dumps({"probe": "u32_mul_exact", "ok": bool((got == want).all())}), flush=True)


# 2. sublane shift via concatenate (limb shift towards higher indices)
def k_shift(a_ref, o_ref):
    x = a_ref[:]
    z = jnp.zeros((1, W), jnp.uint32)
    o_ref[:] = jnp.concatenate([z, x[:-1]], axis=0)


run("sublane_concat_shift", k_shift, (a,), jax.ShapeDtypeStruct((16, W), jnp.uint32))


# 3. shifts/masks/compares/select
def k_bits(a_ref, b_ref, o_ref):
    x = a_ref[:]
    y = b_ref[:]
    lo = x & jnp.uint32(0xFFFF)
    hi = x >> jnp.uint32(16)
    m = lo < y
    o_ref[:] = jnp.where(m, lo + hi, y)


run("bitops_select", k_bits, (a, b), jax.ShapeDtypeStruct((16, W), jnp.uint32))


# 4. unrolled conv accumulation pattern (the heart of mul25519_s)
def k_conv(a_ref, b_ref, o_ref):
    x = a_ref[:]
    y = b_ref[:]
    acc_lo = jnp.zeros((31, W), jnp.uint32)
    acc_hi = jnp.zeros((31, W), jnp.uint32)
    for i in range(16):
        p = x[i : i + 1, :] * y  # (16, W)
        pad_lo = 31 - 16 - i
        plo = jnp.pad(p & jnp.uint32(0xFFFF), ((i, pad_lo), (0, 0)))
        phi = jnp.pad(p >> jnp.uint32(16), ((i, pad_lo), (0, 0)))
        acc_lo = acc_lo + plo
        acc_hi = acc_hi + phi
    o_ref[:] = jnp.concatenate([acc_lo, acc_hi], axis=0)


got = run("conv_accum", k_conv, (a, b), jax.ShapeDtypeStruct((62, W), jnp.uint32))
if got is not None:
    an = np.asarray(a, dtype=np.uint64)
    bn = np.asarray(b, dtype=np.uint64)
    want_lo = np.zeros((31, W), np.uint64)
    want_hi = np.zeros((31, W), np.uint64)
    for i in range(16):
        for j in range(16):
            p = an[i] * bn[j]
            want_lo[i + j] += p & 0xFFFF
            want_hi[i + j] += p >> 16
    ok = bool((got[:31] == want_lo).all() and (got[31:] == want_hi).all())
    print(json.dumps({"probe": "conv_accum_exact", "ok": ok}), flush=True)


# 5. grid + halving reduction over the lane axis
def k_halve(a_ref, o_ref):
    x = a_ref[:]
    w = W
    while w > 1:
        w //= 2
        x = x[:, :w] + x[:, w : 2 * w]
    o_ref[:] = x


run("lane_halving", k_halve, (a,), jax.ShapeDtypeStruct((16, 1), jnp.uint32))


# 6. dynamic one-hot select from a table along the leading axis
tab = jnp.asarray(rs.randint(0, 1 << 16, (16, 16, W), dtype=np.uint32))
dig = jnp.asarray(rs.randint(0, 16, (1, W), dtype=np.int32))


def k_sel(tab_ref, dig_ref, o_ref):
    d = dig_ref[:]
    acc = jnp.zeros((16, W), jnp.uint32)
    for v in range(16):
        acc = acc + jnp.where(d == v, tab_ref[v], jnp.uint32(0))
    o_ref[:] = acc


got = run("table_select", k_sel, (tab, dig), jax.ShapeDtypeStruct((16, W), jnp.uint32))
if got is not None:
    tn, dn = np.asarray(tab), np.asarray(dig)
    want = np.take_along_axis(tn, dn[None].repeat(16, axis=1), axis=0)[0]
    print(json.dumps({"probe": "table_select_exact", "ok": bool((got == want).all())}), flush=True)


# 7. fori_loop with index-dependent dynamic slice read (window loop)
big = jnp.asarray(rs.randint(0, 1 << 16, (64, 16, W), dtype=np.uint32))


def k_scan(big_ref, o_ref):
    def body(i, acc):
        return acc + big_ref[i]

    o_ref[:] = jax.lax.fori_loop(0, 64, body, jnp.zeros((16, W), jnp.uint32))


got = run("fori_dynamic_read", k_scan, (big,), jax.ShapeDtypeStruct((16, W), jnp.uint32))
if got is not None:
    want = np.asarray(big, dtype=np.uint64).sum(axis=0) & 0xFFFFFFFF
    print(json.dumps({"probe": "fori_dynamic_read_exact", "ok": bool((got == want).all())}), flush=True)

print(json.dumps({"probe": "platform", "ok": True, "sample": [jax.devices()[0].platform]}), flush=True)
