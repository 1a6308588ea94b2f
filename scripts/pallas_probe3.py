"""Round-4 probe #2: reproduce the conv-after-lane-slice Mosaic failure and
pick the fix.

probe2 showed the conv accumulation itself compiles; the gate failure's
tpu.concatenate had an operand with LANE offset 32 — a halving-sum hi-half
slice (x[:, w:2w]) flowing into the next level's conv.  Candidates:

  G  repro: two halving levels, conv between the halves (expect FAIL)
  H  pltpu.roll the hi half to lane offset 0 before the conv
  I  jnp.roll ditto (works under plain jit too, if Mosaic takes it)
  K  reshape (..., 2, w) and index the pair axis instead of lane slices

    python scripts/pallas_probe3.py
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


rs = np.random.RandomState(1)
a = jnp.asarray(rs.randint(0, 1 << 16, (16, W), dtype=np.uint32))
an = np.asarray(a, dtype=np.uint64)


def _conv16(lo, hi, w):
    """The pfield conv shape on (16, w) operands -> (16, w) (top-16 rows)."""
    acc = jnp.zeros((31, w), jnp.uint32)
    for i in range(16):
        p = lo[i : i + 1] * hi
        acc = acc + jnp.pad(p & jnp.uint32(0xFFFF), ((i, 15 - i), (0, 0)))
    return acc[:16] + acc[15:31]


def _conv16_host(lo, hi):
    acc = np.zeros((31,) + lo.shape[1:], np.uint64)
    for i in range(16):
        p = (lo[i : i + 1] * hi) & 0xFFFF
        acc[i : i + 16] += p
    return (acc[:16] + acc[15:31]) & 0xFFFFFFFF


def _host_levels(x, take_hi):
    w = W
    cur = x
    for _ in range(2):
        w //= 2
        lo, hi = cur[:, :w], cur[:, w : 2 * w]
        cur = _conv16_host(lo, hi)
    return cur


# G. repro: halving levels whose hi halves are lane-offset slices
def k_repro(a_ref, o_ref):
    x = a_ref[:]
    w = W
    for _ in range(2):
        w //= 2
        lo, hi = x[:, :w], x[:, w : 2 * w]
        x = _conv16(lo, hi, w)
    o_ref[:] = x


run(
    "G_halve_conv_repro",
    k_repro,
    (a,),
    jax.ShapeDtypeStruct((16, W // 4), jnp.uint32),
    lambda got: (got == _host_levels(an, None)).all(),
)


# H. pltpu.roll fix: hi = roll(x, -w, lanes)[:, :w] (offset-0 slice)
def k_roll(a_ref, o_ref):
    x = a_ref[:]
    w = W
    for _ in range(2):
        w //= 2
        lo = x[:, :w]
        hi = pltpu.roll(x, -w, 1)[:, :w]
        x = _conv16(lo, hi, w)
    o_ref[:] = x


run(
    "H_pltpu_roll",
    k_roll,
    (a,),
    jax.ShapeDtypeStruct((16, W // 4), jnp.uint32),
    lambda got: (got == _host_levels(an, None)).all(),
)


# I. jnp.roll fix (portable to plain jit)
def k_jroll(a_ref, o_ref):
    x = a_ref[:]
    w = W
    for _ in range(2):
        w //= 2
        lo = x[:, :w]
        hi = jnp.roll(x, -w, 1)[:, :w]
        x = _conv16(lo, hi, w)
    o_ref[:] = x


run(
    "I_jnp_roll",
    k_jroll,
    (a,),
    jax.ShapeDtypeStruct((16, W // 4), jnp.uint32),
    lambda got: (got == _host_levels(an, None)).all(),
)


# K. reshape pair axis: (16, 2, w) indexed on the pair axis
def k_reshape(a_ref, o_ref):
    x = a_ref[:]
    w = W
    for _ in range(2):
        w //= 2
        pairs = x.reshape(16, 2, w)
        lo, hi = pairs[:, 0], pairs[:, 1]
        x = _conv16(lo, hi, w)
    o_ref[:] = x


run(
    "K_reshape_pairs",
    k_reshape,
    (a,),
    jax.ShapeDtypeStruct((16, W // 4), jnp.uint32),
    lambda got: (got == _host_levels(an, None)).all(),
)

print(json.dumps({"probe": "done", "ok": True}), flush=True)
