"""Limb-major pallas field/point helpers vs the limb-minor reference kernels.

pfield must agree with ops/field.py and ops/edwards.py exactly (same
mathematics, transposed layout); these run under plain jit on CPU — no
pallas involved — so any mismatch is a pfield math bug, not a Mosaic one.
"""


import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bulletproofs_plus_tpu.ops import edwards as ed  # noqa: E402
from bulletproofs_plus_tpu.ops import field as F  # noqa: E402
from bulletproofs_plus_tpu.ops import host_ristretto as hr  # noqa: E402
from bulletproofs_plus_tpu.ops import pfield as pf  # noqa: E402
from bulletproofs_plus_tpu.ops.limbs import int_from_limbs, pack_ints  # noqa: E402


def _rand_fp(rs, n):
    vals = [int.from_bytes(rs.bytes(32), "little") % hr.P for _ in range(n)]
    return vals, jnp.asarray(pack_ints(vals))


def _canon_rows(x_rows):
    """(16, W) limb-major -> list of canonical ints."""
    arr = np.asarray(x_rows).T  # (W, 16)
    return [int_from_limbs(arr[i]) % hr.P for i in range(arr.shape[0])]


@pytest.mark.parametrize("op", ["mul", "add", "sub", "neg", "sqr", "mul_small"])
def test_pfield_matches_field(op):
    rs = np.random.RandomState(17)
    W = 8
    av, a = _rand_fp(rs, W)
    bv, b = _rand_fp(rs, W)
    at, bt = a.T, b.T  # (16, W) limb-major

    if op == "mul":
        got = jax.jit(pf.mul)(at, bt)
        want = [x * y % hr.P for x, y in zip(av, bv)]
    elif op == "add":
        got = jax.jit(pf.add)(at, bt)
        want = [(x + y) % hr.P for x, y in zip(av, bv)]
    elif op == "sub":
        got = jax.jit(pf.sub)(at, bt)
        want = [(x - y) % hr.P for x, y in zip(av, bv)]
    elif op == "neg":
        got = jax.jit(pf.neg)(at)
        want = [(-x) % hr.P for x in av]
    elif op == "sqr":
        got = jax.jit(pf.sqr)(at)
        want = [x * x % hr.P for x in av]
    else:
        got = jax.jit(lambda x: pf.mul_small(x, 2))(at)
        want = [2 * x % hr.P for x in av]
    assert _canon_rows(got) == want


def test_pfield_trailing_axes():
    """Ops must broadcast over arbitrary trailing shapes (the kernels use
    (16, windows, lanes) work arrays)."""
    rs = np.random.RandomState(3)
    vals, a = _rand_fp(rs, 12)
    at = a.T.reshape(16, 3, 4)
    got = jax.jit(pf.mul)(at, at)
    want = [v * v % hr.P for v in vals]
    assert _canon_rows(got.reshape(16, 12)) == want


def _to_points_s(pts):
    """host points -> limb-major PointS (16, W)."""
    pa = ed.from_host(pts)
    return pf.PointS(*(jnp.asarray(c).T for c in pa))


def _point_from_s(p, idx=()):
    coords = [np.asarray(c) for c in p]
    vals = [int_from_limbs(c[(slice(None),) + idx]) % hr.P for c in coords]
    return tuple(vals)


@pytest.mark.parametrize("case", ["add", "double", "identity_absorb"])
def test_pfield_point_ops(case):
    ps = [hr.point_mul(3 * i + 2, hr.BASEPOINT) for i in range(4)]
    qs = [hr.point_mul(7 * i + 5, hr.BASEPOINT) for i in range(4)]
    P_s, Q_s = _to_points_s(ps), _to_points_s(qs)

    if case == "add":
        got = jax.jit(pf.padd)(P_s, Q_s)
        want = [hr.point_add(p, q) for p, q in zip(ps, qs)]
    elif case == "double":
        got = jax.jit(pf.pdbl)(P_s)
        want = [hr.point_double(p) for p in ps]
    else:
        got = jax.jit(pf.padd)(P_s, pf.identity((4,)))
        want = ps
    for i in range(4):
        assert hr.point_equal(_point_from_s(got, (i,)), want[i])


def test_pfield_lane_halve_sum():
    ps = [hr.point_mul(i + 1, hr.BASEPOINT) for i in range(8)]
    P_s = _to_points_s(ps)
    got = jax.jit(lambda p: pf.lane_halve_sum(p, axis=1, width=8))(P_s)
    want = hr.IDENTITY
    for p in ps:
        want = hr.point_add(want, p)
    assert hr.point_equal(_point_from_s(got, (0,)), want)


def test_fold16_carry_out_edge():
    """Regression: the 2^256==38 fold must iterate until the static bound
    proves the value fits 16 limbs.  A single fold truncates the final
    carry-out (2^256 ≡ 38 silently dropped) whenever the folded value lands
    in [2^256, 2^256 + 38*q) — deterministically reachable: identity adds
    produce 2p-offset representations whose sub/add results store as
    2^256 - 30, and (2^256 - 30)^2 then hits the window (round-4/5 hardware
    'wrong value' root cause)."""
    from bulletproofs_plus_tpu.ops.limbs import limbs_from_int

    edge = jnp.asarray(limbs_from_int(2**256 - 30).reshape(16, 1))
    got = int_from_limbs(np.asarray(pf.mul(edge, edge))[:, 0]) % hr.P
    assert got == pow(2**256 - 30, 2, hr.P) == 64

    # the end-to-end shape it was found in: id; +id; +B; +B == 2B
    base = ed.from_host([hr.BASEPOINT])
    B = pf.PointS(*(jnp.transpose(c, (1, 0)) for c in base))
    acc = pf.padd(pf.padd(pf.padd(pf.identity((1,)), pf.identity((1,))), B), B)
    gx, gy, gz = (int_from_limbs(np.asarray(c)[:, 0]) % hr.P for c in (acc.x, acc.y, acc.z))
    want = hr.point_mul(2, hr.BASEPOINT)
    zi = pow(gz, hr.P - 2, hr.P)
    wzi = pow(want[2], hr.P - 2, hr.P)
    assert gx * zi % hr.P == want[0] * wzi % hr.P
    assert gy * zi % hr.P == want[1] * wzi % hr.P
