"""Edwards/Ristretto device-kernel tests against the host oracle."""

import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import os
import random

import numpy as np
import jax.numpy as jnp

from bulletproofs_plus_tpu.ops import edwards as ed
from bulletproofs_plus_tpu.ops import field as F
from bulletproofs_plus_tpu.ops import host_ristretto as hr
from bulletproofs_plus_tpu.ops import ristretto as ris
from bulletproofs_plus_tpu.ops.limbs import bytes_from_limbs, limbs_from_bytes, pack_ints

rng = random.Random(99)


def _rand_points(n):
    return [hr.from_uniform_bytes(os.urandom(64)) for _ in range(n)]


def _compress_all(pa):
    limbs = np.asarray(ris.compress(pa))
    return [bytes(bytes_from_limbs(limbs[i]).tobytes()) for i in range(limbs.shape[0])]


def test_add_double_vs_host():
    ps = _rand_points(8)
    qs = _rand_points(8)
    pa, qa = ed.from_host(ps), ed.from_host(qs)
    s = ed.add(pa, qa)
    d = ed.double(pa)
    n = ed.neg(pa)
    s_host = ed.to_host(s)
    d_host = ed.to_host(d)
    n_host = ed.to_host(n)
    for i in range(8):
        assert hr.compress(s_host[i]) == hr.compress(hr.point_add(ps[i], qs[i]))
        assert hr.compress(d_host[i]) == hr.compress(hr.point_double(ps[i]))
        assert hr.compress(n_host[i]) == hr.compress(hr.point_neg(ps[i]))


def test_identity_and_complete_addition():
    ps = _rand_points(4)
    pa = ed.from_host(ps)
    idp = ed.identity((4,))
    # P + 0 = P ; P + P = 2P ; P + (-P) = 0
    r1 = ed.add(pa, idp)
    r2 = ed.add(pa, pa)
    r3 = ed.add(pa, ed.neg(pa))
    assert np.asarray(ris.point_equal(r1, pa)).all()
    assert np.asarray(ris.point_equal(r2, ed.double(pa))).all()
    assert np.asarray(ris.is_identity(r3)).all()


def test_compress_matches_host():
    ps = _rand_points(8) + [hr.IDENTITY, hr.BASEPOINT]
    pa = ed.from_host(ps)
    enc = _compress_all(pa)
    for i, p in enumerate(ps):
        assert enc[i] == hr.compress(p), i


def test_decompress_roundtrip_and_rejection():
    ps = _rand_points(8)
    encs = [hr.compress(p) for p in ps]
    limbs = jnp.asarray(np.stack([limbs_from_bytes(e) for e in encs]))
    pts, ok = ris.decompress(limbs)
    assert np.asarray(ok).all()
    host_pts = ed.to_host(pts)
    for i, p in enumerate(ps):
        assert hr.point_equal(host_pts[i], p)
    # non-canonical / invalid encodings rejected
    bad = [
        bytes([1]) + bytes(31),                      # negative (odd)
        hr.P.to_bytes(32, "little"),                  # == p
        (2**255 - 1).to_bytes(32, "little"),          # > p
    ]
    # a non-square candidate: flip a byte of a valid encoding until invalid
    limbs_bad = jnp.asarray(np.stack([limbs_from_bytes(b) for b in bad]))
    _, okb = ris.decompress(limbs_bad)
    assert not np.asarray(okb).any()
    # identity decompresses fine
    _, oki = ris.decompress(jnp.asarray(limbs_from_bytes(bytes(32)))[None])
    assert np.asarray(oki).all()


def test_scalar_mul_vs_host():
    ps = _rand_points(3)
    ks = [rng.randrange(hr.L) for _ in range(3)]
    pa = ed.from_host(ps)
    ka = jnp.asarray(pack_ints(ks))
    out = ed.to_host(ed.scalar_mul(ka, pa))
    for i in range(3):
        assert hr.compress(out[i]) == hr.compress(hr.point_mul(ks[i], ps[i]))


def test_double_scalar_mul():
    ps = _rand_points(2)
    qs = _rand_points(2)
    a = [rng.randrange(hr.L) for _ in range(2)]
    b = [rng.randrange(hr.L) for _ in range(2)]
    out = ed.to_host(
        ed.double_scalar_mul(jnp.asarray(pack_ints(a)), ed.from_host(ps), jnp.asarray(pack_ints(b)), ed.from_host(qs))
    )
    for i in range(2):
        expect = hr.point_add(hr.point_mul(a[i], ps[i]), hr.point_mul(b[i], qs[i]))
        assert hr.compress(out[i]) == hr.compress(expect)


def test_sqrt_ratio_m1_vs_host():
    us = [rng.randrange(hr.P) for _ in range(6)] + [0, 1]
    vs = [rng.randrange(hr.P) for _ in range(6)] + [1, 1]
    ua = jnp.asarray(pack_ints(us))
    va = jnp.asarray(pack_ints(vs))
    ok, r = ris.sqrt_ratio_m1(ua, va)
    ok = np.asarray(ok)
    r = np.asarray(F.canon25519(r))
    from bulletproofs_plus_tpu.ops.limbs import int_from_limbs

    for i in range(len(us)):
        ok_h, r_h = hr.sqrt_ratio_m1(us[i], vs[i])
        assert bool(ok[i]) == ok_h, i
        assert int_from_limbs(r[i]) == r_h, i
