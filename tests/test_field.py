"""Field kernel tests: GF(2^255-19) and GF(l) limb arithmetic vs python ints."""


import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import random

import numpy as np
import pytest

import jax.numpy as jnp

from bulletproofs_plus_tpu.ops import field as F
from bulletproofs_plus_tpu.ops.limbs import NLIMBS, int_from_limbs, limbs_from_int, pack_ints

P = F.P
L = F.L

rng = random.Random(20260816)

EDGE = [0, 1, 2, 19, 38, P - 1, P, P + 1, 2 * P - 1, 2 * P, 2**255, 2**256 - 1, L - 1, L, L + 1]


def _rand_vals(n, bound):
    return [rng.randrange(bound) for _ in range(n)]


def _batch(vals):
    return jnp.asarray(pack_ints(vals))


def _ints(arr):
    return [int_from_limbs(np.asarray(arr)[i]) for i in range(np.asarray(arr).shape[0])]


class TestFp:
    def test_add_sub_mul(self):
        a_vals = EDGE + _rand_vals(64, 2**256)
        b_vals = list(reversed(EDGE)) + _rand_vals(64, 2**256)
        a, b = _batch(a_vals), _batch(b_vals)
        add = _ints(F.add25519(a, b))
        sub = _ints(F.sub25519(a, b))
        mul = _ints(F.mul25519(a, b))
        sqr = _ints(F.sqr25519(a))
        neg = _ints(F.neg25519(a))
        for i, (x, y) in enumerate(zip(a_vals, b_vals)):
            assert add[i] % P == (x + y) % P, f"add {i}"
            assert add[i] < 2**256
            assert sub[i] % P == (x - y) % P, f"sub {i}"
            assert sub[i] < 2**256
            assert mul[i] % P == (x * y) % P, f"mul {i}"
            assert mul[i] < 2**256
            assert sqr[i] % P == (x * x) % P
            assert neg[i] % P == (-x) % P

    def test_worst_case_limbs(self):
        # all-0xFFFF limbs both sides (max accumulation)
        x = 2**256 - 1
        a = _batch([x])
        assert _ints(F.mul25519(a, a))[0] % P == (x * x) % P

    def test_canon_eq(self):
        vals = [0, 19, P - 1, P, P + 1, 2 * P, 2 * P + 5, 2**256 - 1]
        a = _batch(vals)
        canon = _ints(F.canon25519(a))
        for i, x in enumerate(vals):
            assert canon[i] == x % P
        # eq across representatives
        assert bool(F.eq25519(_batch([P + 7])[0], _batch([7])[0]))
        assert not bool(F.eq25519(_batch([8])[0], _batch([7])[0]))
        assert bool(F.is_zero25519(_batch([2 * P])[0]))

    def test_inv_pow(self):
        vals = [1, 2, P - 2] + _rand_vals(8, P)
        vals = [v for v in vals if v % P != 0]
        a = _batch(vals)
        inv = _ints(F.inv25519(a))
        for i, x in enumerate(vals):
            assert inv[i] % P == pow(x, P - 2, P)

    def test_negative_abs(self):
        vals = [1, 2, P - 1, P - 2] + _rand_vals(8, P)
        a = _batch(vals)
        isneg = np.asarray(F.is_negative25519(a))
        ab = _ints(F.abs25519(a))
        for i, x in enumerate(vals):
            assert bool(isneg[i]) == bool(x % P & 1)
            assert ab[i] % P == (P - x) % P if (x % P) & 1 else x % P

    def test_mul_small(self):
        vals = EDGE + _rand_vals(8, 2**256)
        a = _batch(vals)
        for k in (2, 38, 2**15 - 1):
            out = _ints(F.mul_small25519(a, k))
            for i, x in enumerate(vals):
                assert out[i] % P == (x * k) % P
        with pytest.raises(AssertionError):
            F.mul_small25519(a, 2**15)  # product would overflow uint32


class TestFl:
    def test_mul_add_sub(self):
        a_vals = [v % L for v in EDGE] + _rand_vals(64, L)
        b_vals = [v % L for v in reversed(EDGE)] + _rand_vals(64, L)
        a, b = _batch(a_vals), _batch(b_vals)
        mul = _ints(F.mul_l(a, b))
        add = _ints(F.add_l(a, b))
        sub = _ints(F.sub_l(a, b))
        neg = _ints(F.neg_l(a))
        for i, (x, y) in enumerate(zip(a_vals, b_vals)):
            assert mul[i] == (x * y) % L, f"mul {i}"
            assert add[i] == (x + y) % L, f"add {i}"
            assert sub[i] == (x - y) % L, f"sub {i}"
            assert neg[i] == (-x) % L, f"neg {i}"

    def test_barrett_wide(self):
        # 512-bit wide reduction (Scalar::from_bytes_mod_order_wide parity)
        vals = [0, 1, L, L - 1, 2**512 - 1, 2**511, (L - 1) ** 2] + _rand_vals(32, 2**512)
        arr = jnp.asarray(np.stack([limbs_from_int(v, 32) for v in vals]))
        out = _ints(F.reduce_wide_l(arr))
        for i, v in enumerate(vals):
            assert out[i] == v % L, f"wide {i}"

    def test_inv(self):
        vals = [1, 2, L - 1] + _rand_vals(8, L)
        vals = [v for v in vals if v % L]
        a = _batch(vals)
        inv = _ints(F.inv_l(a))
        for i, x in enumerate(vals):
            assert (inv[i] * x) % L == 1

    def test_pow(self):
        x = rng.randrange(L)
        e = 2**64 + 12345
        out = _ints(F.pow_l(_batch([x]), e))[0]
        assert out == pow(x, e, L)


def test_vmap_and_jit_compat():
    import jax

    a = _batch(_rand_vals(4, P))
    b = _batch(_rand_vals(4, P))
    f = jax.jit(F.mul25519)
    out = _ints(f(a, b))
    ref = _ints(F.mul25519(a, b))
    assert out == ref
    # leading-axis polymorphism
    a2 = a.reshape(2, 2, NLIMBS)
    out2 = F.mul25519(a2, b.reshape(2, 2, NLIMBS))
    assert out2.shape == (2, 2, NLIMBS)
