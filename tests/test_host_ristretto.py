"""Host (pure Python) ristretto255 oracle tests, pinned to public constants."""

import os
import random

from bulletproofs_plus_tpu.ops import host_ristretto as hr

# Small multiples of the ristretto255 basepoint (RFC 9496 Appendix A.1).
SMALL_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
]


def test_basepoint_multiples():
    acc = hr.IDENTITY
    for i, expected in enumerate(SMALL_MULTIPLES):
        assert hr.compress(acc).hex() == expected, i
        acc = hr.point_add(acc, hr.BASEPOINT)


def test_compress_decompress_roundtrip():
    for _ in range(20):
        p = hr.from_uniform_bytes(os.urandom(64))
        b = hr.compress(p)
        q = hr.decompress(b)
        assert q is not None
        assert hr.point_equal(p, q)
        assert hr.compress(q) == b


def test_decompress_rejects_noncanonical():
    # odd ("negative") field element
    assert hr.decompress(bytes([1]) + bytes(31)) is None
    # >= p
    assert hr.decompress(hr.P.to_bytes(32, "little")) is None
    assert hr.decompress((hr.P + 2).to_bytes(32, "little")) is None
    # random junk usually fails; at minimum must not crash
    for _ in range(10):
        hr.decompress(os.urandom(32))


def test_scalar_mul_linearity():
    rng = random.Random(1234)
    for _ in range(5):
        a = rng.randrange(hr.L)
        b = rng.randrange(hr.L)
        lhs = hr.point_mul((a + b) % hr.L, hr.BASEPOINT)
        rhs = hr.point_add(hr.point_mul(a, hr.BASEPOINT), hr.point_mul(b, hr.BASEPOINT))
        assert hr.compress(lhs) == hr.compress(rhs)


def test_add_double_consistency():
    p = hr.from_uniform_bytes(os.urandom(64))
    assert hr.compress(hr.point_add(p, p)) == hr.compress(hr.point_double(p))
    # affine-law cross-check of the extended-coordinates addition
    q = hr.from_uniform_bytes(os.urandom(64))
    x1, y1 = _affine(p)
    x2, y2 = _affine(q)
    den = hr.D * x1 % hr.P * x2 % hr.P * y1 % hr.P * y2 % hr.P
    x3 = (x1 * y2 + y1 * x2) % hr.P * pow(1 + den, hr.P - 2, hr.P) % hr.P
    y3 = (y1 * y2 + x1 * x2) % hr.P * pow(1 - den, hr.P - 2, hr.P) % hr.P
    s = hr.point_add(p, q)
    xs, ys = _affine(s)
    assert (xs, ys) == (x3, y3)


def _affine(p):
    x, y, z, _ = p
    zi = pow(z, hr.P - 2, hr.P)
    return x * zi % hr.P, y * zi % hr.P


def test_neg_and_identity():
    p = hr.from_uniform_bytes(os.urandom(64))
    assert hr.is_identity(hr.point_add(p, hr.point_neg(p)))
    assert hr.is_identity(hr.point_mul(hr.L, hr.BASEPOINT))
    assert hr.compress(hr.IDENTITY) == bytes(32)


def test_scalar_codec():
    assert hr.scalar_from_canonical_bytes(bytes(32)) == 0
    assert hr.scalar_from_canonical_bytes(hr.L.to_bytes(32, "little")) is None
    assert hr.scalar_from_canonical_bytes((hr.L - 1).to_bytes(32, "little")) == hr.L - 1
    wide = os.urandom(64)
    assert hr.scalar_from_bytes_mod_order_wide(wide) == int.from_bytes(wide, "little") % hr.L
