"""Pallas MSM kernels vs the host Pippenger oracle (interpret mode on CPU).

One tiny shape per kernel: interpret-mode pallas is slow, and the kernel
bodies are already unit-tested piecewise by test_pfield.py; these check the
grid/block plumbing and digit bookkeeping end to end.  On real TPU hardware
the same code runs compiled (scripts/profile_tpu.py + bench.py measure it).
"""


import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bulletproofs_plus_tpu.ops import edwards as ed  # noqa: E402
from bulletproofs_plus_tpu.ops import host_ristretto as hr  # noqa: E402
from bulletproofs_plus_tpu.ops import pallas_msm as pm  # noqa: E402
from bulletproofs_plus_tpu.ops.fixed_base import build_tables, transpose_tables  # noqa: E402
from bulletproofs_plus_tpu.ops.limbs import pack_ints  # noqa: E402
from bulletproofs_plus_tpu.ops.msm import host_msm  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pm, "_INTERPRET", True)


@pytest.mark.parametrize("n", [8, 16])  # 16 -> 2 lane tiles: covers the
def test_dynamic_msm_matches_host(n):  # cross-tile reduce in msm_finish
    scalars = [(i * 0x9E3779B97F4A7C15 + 3) % hr.L for i in range(n)]
    pts = [hr.point_mul(2 * i + 1, hr.BASEPOINT) for i in range(n)]
    sc = jnp.asarray(pack_ints(scalars))
    pa = ed.from_host(pts)
    got = pm.msm_kernel_pallas(sc, pa, lc=8)
    want = host_msm(scalars, pts)
    assert hr.point_equal(ed.to_host(got), want)


def test_fixed_msm_batched_matches_host():
    S, B = 6, 3  # padded to sc=8 inside
    base_pts = [hr.point_mul(5 * i + 2, hr.BASEPOINT) for i in range(S)]
    tables = build_tables(ed.from_host(base_pts))
    tabs_t = transpose_tables(tables)
    rs = np.random.RandomState(11)
    scal = [[int.from_bytes(rs.bytes(32), "little") % hr.L for _ in range(S)] for _ in range(B)]
    sc = jnp.asarray(pack_ints([v for row in scal for v in row])).reshape(B, S, 16)
    got = pm.fixed_msm_batched_pallas(sc, tabs_t)
    for b in range(B):
        want = host_msm(scal[b], base_pts)
        assert hr.point_equal(ed.to_host(pm.PointS(*(c[b] for c in got))), want)


def test_fixed_msm_grouped_matches_host():
    S, B, G = 8, 2, 2
    base_pts = [hr.point_mul(9 * i + 4, hr.BASEPOINT) for i in range(S)]
    tables = build_tables(ed.from_host(base_pts))
    tabs_t = transpose_tables(tables)
    rs = np.random.RandomState(5)
    scal = [[int.from_bytes(rs.bytes(32), "little") % hr.L for _ in range(S)] for _ in range(B)]
    sc = jnp.asarray(pack_ints([v for row in scal for v in row])).reshape(B, S, 16)
    got = pm.fixed_msm_batched_pallas(sc, tabs_t, groups=G)
    half = S // G
    for b in range(B):
        for g in range(G):
            want = host_msm(scal[b][g * half : (g + 1) * half], base_pts[g * half : (g + 1) * half])
            point = pm.PointS(*(np.asarray(c)[b, g] for c in got))
            assert hr.point_equal(ed.to_host(ed.PointArray(*point)), want)


def test_pow_p58_pallas_matches_host():
    """VMEM pow-chain kernel (ops/pallas_pow.py) vs python pow; includes the
    lane-padding path (130 lanes -> 256) and edge values 0, 1, p-1."""
    from bulletproofs_plus_tpu.ops.limbs import unpack_ints
    from bulletproofs_plus_tpu.ops.pallas_pow import pow_p58_pallas

    rs = np.random.RandomState(23)
    vals = [0, 1, hr.P - 1, 2] + [
        int.from_bytes(rs.bytes(32), "little") % hr.P for _ in range(126)
    ]
    got = unpack_ints(np.asarray(pow_p58_pallas(jnp.asarray(pack_ints(vals)))))
    want = [pow(v, (hr.P - 5) // 8, hr.P) for v in vals]
    assert [g % hr.P for g in got] == want  # pfield limbs are not canonicalized


def test_pow_p58_pallas_2d_shape():
    """Leading-axes flattening: (3, 2, 16) inputs round-trip the reshape."""
    from bulletproofs_plus_tpu.ops.limbs import unpack_ints
    from bulletproofs_plus_tpu.ops.pallas_pow import pow_p58_pallas

    vals = [7 * i + 3 for i in range(6)]
    x = jnp.asarray(pack_ints(vals)).reshape(3, 2, 16)
    got = unpack_ints(np.asarray(pow_p58_pallas(x)).reshape(6, 16))
    want = [pow(v, (hr.P - 5) // 8, hr.P) for v in vals]
    assert [g % hr.P for g in got] == want


def test_signed_digits4_reconstructs():
    """Signed recode: sum_j d_j 16^j == s with every digit in [-8, 7]."""
    from bulletproofs_plus_tpu.ops.pallas_msm import signed_digits4

    rs = np.random.RandomState(31)
    vals = [0, 1, hr.L - 1, (1 << 252) + 5] + [
        int.from_bytes(rs.bytes(32), "little") % hr.L for _ in range(28)
    ]
    digs = np.asarray(signed_digits4(jnp.asarray(pack_ints(vals))))
    assert digs.min() >= -8 and digs.max() <= 7
    for i, v in enumerate(vals):
        assert sum(int(digs[j, i]) * 16**j for j in range(64)) == v


def test_msm_kernel_pallas_signed_matches_host():
    """Signed-digit dynamic MSM kernel vs host Pippenger (interpret mode)."""
    n = 8
    rs = np.random.RandomState(17)
    scal = [int.from_bytes(rs.bytes(32), "little") % hr.L for _ in range(n)]
    base_pts = [hr.point_mul(3 * i + 1, hr.BASEPOINT) for i in range(n)]
    sc = jnp.asarray(pack_ints(scal))
    pts = ed.from_host(base_pts)
    got = pm.msm_kernel_pallas(sc, pts, lc=8, signed=True)
    want = host_msm(scal, base_pts)
    assert hr.point_equal(ed.to_host(got), want)
