"""Device verification engine vs the host oracle, plus fixed-base tables and
the sharded MSM — all on the virtual CPU mesh (see conftest.py).

Kept to one tiny proof shape per kernel: XLA CPU compiles of the ladder
scans dominate runtime, and one shape exercises the full code path.
"""


import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import hashlib

import jax
import jax.numpy as jnp
import pytest

from bulletproofs_plus_tpu import (
    CommitmentOpening,
    ExtensionDegree,
    RangeParameters,
    RangeProof,
    RangeStatement,
    RangeWitness,
    SeededRng,
    Transcript,
    VerificationFailed,
    VerifyAction,
    create_pedersen_gens_with_extension_degree,
)
from bulletproofs_plus_tpu.ops import edwards as ed
from bulletproofs_plus_tpu.ops import host_ristretto as hr
from bulletproofs_plus_tpu.ops.limbs import pack_ints
from bulletproofs_plus_tpu.ops.msm import host_msm


def _det(tag: str) -> int:
    return int.from_bytes(hashlib.shake_256(tag.encode()).digest(64), "little") % hr.L


@pytest.fixture(scope="module")
def small_batch():
    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(4, 1, pc)
    rng = SeededRng(31337)
    statements, witnesses, proofs = [], [], []
    for i in range(2):
        v, r = 3 + i, _det(f"dv-blind-{i}")
        c = pc.commit(v, [r])
        s = RangeStatement.init(params, [c], [None], _det(f"dv-seed-{i}"))
        w = RangeWitness.init([CommitmentOpening(v, [r])])
        proofs.append(RangeProof.prove_with_rng(Transcript(b"dev"), s, w, rng))
        statements.append(s)
        witnesses.append(w)
    return pc, params, statements, witnesses, proofs


def test_device_engine_matches_host(small_batch):
    pc, params, statements, witnesses, proofs = small_batch
    masks_host = RangeProof.verify_batch(
        [Transcript(b"dev"), Transcript(b"dev")], statements, proofs,
        VerifyAction.RECOVER_AND_VERIFY,
    )
    masks_dev = RangeProof.verify_batch(
        [Transcript(b"dev"), Transcript(b"dev")], statements, proofs,
        VerifyAction.RECOVER_AND_VERIFY, engine="device",
    )
    for mh, md, w in zip(masks_host, masks_dev, witnesses):
        assert mh == md
        assert md.blindings() == w.openings[0].r


def test_device_engine_rejects_tampered(small_batch):
    pc, params, statements, witnesses, proofs = small_batch
    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.r1 = (bad.r1 + 1) % hr.L
    with pytest.raises(VerificationFailed):
        RangeProof.verify_batch(
            [Transcript(b"dev"), Transcript(b"dev")], statements, [bad, proofs[1]],
            VerifyAction.VERIFY_ONLY, engine="device",
        )


@pytest.mark.parametrize(
    "action",
    [VerifyAction.VERIFY_ONLY, VerifyAction.RECOVER_AND_VERIFY, VerifyAction.RECOVER_ONLY],
)
def test_cross_engine_error_parity(small_batch, action):
    """Non-canonical points and oversized L/R raise the SAME error type and
    message on both engines in every VerifyAction (range_proof.rs:859-888:
    decompression and round checks precede mask recovery)."""
    from bulletproofs_plus_tpu import ProofError

    pc, params, statements, witnesses, proofs = small_batch

    def both_engines(sts, prs):
        outcomes = []
        for engine in ("host", "device"):
            try:
                RangeProof.verify_batch(
                    [Transcript(b"dev") for _ in prs], sts, prs, action, engine=engine
                )
                outcomes.append(None)
            except ProofError as exc:
                outcomes.append((type(exc), str(exc)))
        assert outcomes[0] == outcomes[1], outcomes
        assert outcomes[0] is not None
        return outcomes[0]

    # Non-canonical 'a' (odd s: invalid per RFC 9496) — InvalidArgument
    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.a = bytes([1]) + bytes(31)
    kind, msg = both_engines(statements, [bad, proofs[1]])
    assert "Member 'a' was not the canonical encoding of a point" in msg

    # Oversized L/R (rounds >= 64) — SizeOverflow
    from bulletproofs_plus_tpu import SizeOverflow

    big = RangeProof.from_bytes(proofs[0].to_bytes())
    big.li = [proofs[0].li[0]] * 64
    big.ri = [proofs[0].ri[0]] * 64
    kind, _ = both_engines(statements[:1], [big])
    assert kind is SizeOverflow


def test_device_engine_mixed_shapes_min_values():
    """Aggregated + non-aggregated proofs with minimum values and extension
    degree 2, verified via the multi-group device path."""
    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.ADD_ONE_BASE_POINT)
    params = RangeParameters.init(4, 2, pc)
    rng = SeededRng(999)

    v1, b1 = 9, [_det("dvm-1a"), _det("dvm-1b")]
    s1 = RangeStatement.init(params, [pc.commit(v1, b1)], [4], None)
    w1 = RangeWitness.init([CommitmentOpening(v1, b1)])
    p1 = RangeProof.prove_with_rng(Transcript(b"devm"), s1, w1, rng)

    vals, blinds = [3, 12], [[_det("dvm-2a"), _det("dvm-2b")], [_det("dvm-2c"), _det("dvm-2d")]]
    cs = [pc.commit(v, b) for v, b in zip(vals, blinds)]
    s2 = RangeStatement.init(params, cs, [None, 7], None)
    w2 = RangeWitness.init([CommitmentOpening(v, b) for v, b in zip(vals, blinds)])
    p2 = RangeProof.prove_with_rng(Transcript(b"devm"), s2, w2, rng)

    masks = RangeProof.verify_batch(
        [Transcript(b"devm"), Transcript(b"devm")], [s1, s2], [p1, p2],
        VerifyAction.VERIFY_ONLY, engine="device",
    )
    assert masks == [None, None]


@pytest.fixture(scope="module")
def batch_64bit():
    """Flagship-shape fixture: 64-bit single-aggregation proofs (6 IPA
    rounds), the exact shape bench.py runs on the real TPU."""
    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(64, 1, pc)
    rng = SeededRng(64646464)
    statements, witnesses, proofs = [], [], []
    for i in range(2):
        v, r = (1 << 63) + 5 * i, _det(f"d64-{i}")
        c = pc.commit(v, [r])
        s = RangeStatement.init(params, [c], [None], _det(f"d64-seed-{i}"))
        w = RangeWitness.init([CommitmentOpening(v, [r])])
        proofs.append(RangeProof.prove_with_rng(Transcript(b"d64"), s, w, rng))
        statements.append(s)
        witnesses.append(w)
    return pc, params, statements, witnesses, proofs


@pytest.mark.slow
def test_device_engine_64bit_flagship(batch_64bit):
    """64-bit single-group device verification (the bench path: device
    replay kernel + fused verify at fixed_tables_sliced(128)) — recover,
    verify, and tamper-rejection."""
    pc, params, statements, witnesses, proofs = batch_64bit
    masks = RangeProof.verify_batch(
        [Transcript(b"d64"), Transcript(b"d64")], statements, proofs,
        VerifyAction.RECOVER_AND_VERIFY, engine="device",
    )
    for mask, w in zip(masks, witnesses):
        assert mask is not None and mask.blindings() == w.openings[0].r

    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.s1 = (bad.s1 + 1) % hr.L
    with pytest.raises(VerificationFailed):
        RangeProof.verify_batch(
            [Transcript(b"d64"), Transcript(b"d64")], statements, [bad, proofs[1]],
            VerifyAction.VERIFY_ONLY, engine="device",
        )


@pytest.mark.slow
def test_device_engine_64bit_packed_fallback(batch_64bit):
    """Transcripts at different sponge positions cannot stack, so the device
    engine takes the packed verify_group_full path — exercised at 64-bit."""
    pc, params, statements, witnesses, proofs = batch_64bit
    rng = SeededRng(7272)
    # Re-prove with different-length transcript labels (stack() rejects them)
    labels = [b"d64-a", b"d64-longer"]
    sts, prs = [], []
    for i, label in enumerate(labels):
        v, r = (1 << 62) + i, _det(f"d64f-{i}")
        c = pc.commit(v, [r])
        s = RangeStatement.init(params, [c], [None], None)
        w = RangeWitness.init([CommitmentOpening(v, [r])])
        prs.append(RangeProof.prove_with_rng(Transcript(label), s, w, rng))
        sts.append(s)
    masks = RangeProof.verify_batch(
        [Transcript(label) for label in labels], sts, prs,
        VerifyAction.VERIFY_ONLY, engine="device",
    )
    assert masks == [None, None]


@pytest.mark.slow
def test_device_engine_64bit_mixed_shapes(batch_64bit):
    """64-bit aggregated (m=2) + non-aggregated proofs through the
    multi-group device path."""
    pc, params0, statements, witnesses, proofs = batch_64bit
    params = RangeParameters.init(64, 2, pc)
    rng = SeededRng(128128)
    vals = [(1 << 40) + 3, 77]
    blinds = [[_det("d64m-a")], [_det("d64m-b")]]
    cs = [pc.commit(v, b) for v, b in zip(vals, blinds)]
    s2 = RangeStatement.init(params, cs, [None, None], None)
    w2 = RangeWitness.init([CommitmentOpening(v, b) for v, b in zip(vals, blinds)])
    p2 = RangeProof.prove_with_rng(Transcript(b"d64"), s2, w2, rng)

    masks = RangeProof.verify_batch(
        [Transcript(b"d64"), Transcript(b"d64")], [statements[0], s2], [proofs[0], p2],
        VerifyAction.VERIFY_ONLY, engine="device",
    )
    assert masks == [None, None]


def test_fixed_base_tables_match_host():
    from bulletproofs_plus_tpu.ops.fixed_base import build_tables, fixed_msm

    S = 4
    scalars = [_det(f"fb-s-{i}") for i in range(S)]
    points = [hr.point_mul(_det(f"fb-p-{i}"), hr.BASEPOINT) for i in range(S)]
    tables = build_tables(ed.from_host(points))
    out = fixed_msm(jnp.asarray(pack_ints(scalars)), tables)
    assert hr.point_equal(ed.to_host(out), host_msm(scalars, points))


def test_sharded_batch_verify():
    """dp-sharded device verification over the virtual 8-device mesh."""
    from bulletproofs_plus_tpu.parallel.verify import make_dp_mesh

    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(4, 1, pc)
    rng = SeededRng(1717)
    statements, proofs = [], []
    for i in range(8):
        v, r = i % 16, _det(f"shv-{i}")
        s = RangeStatement.init(params, [pc.commit(v, [r])], [None], None)
        w = RangeWitness.init([CommitmentOpening(v, [r])])
        proofs.append(RangeProof.prove_with_rng(Transcript(b"shv"), s, w, rng))
        statements.append(s)

    mesh = make_dp_mesh()
    masks = RangeProof.verify_batch(
        [Transcript(b"shv") for _ in range(8)], statements, proofs,
        VerifyAction.VERIFY_ONLY, engine="device", mesh=mesh,
    )
    assert masks == [None] * 8

    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.s1 = (bad.s1 + 1) % hr.L
    with pytest.raises(VerificationFailed):
        RangeProof.verify_batch(
            [Transcript(b"shv") for _ in range(8)], statements, [bad] + proofs[1:],
            VerifyAction.VERIFY_ONLY, engine="device", mesh=mesh,
        )


def test_sharded_msm_matches_host():
    from bulletproofs_plus_tpu.parallel import make_mesh, pad_for_mesh, sharded_msm_fn

    n = 11
    scalars = [_det(f"sh-s-{i}") for i in range(n)]
    points = [hr.point_mul(_det(f"sh-p-{i}"), hr.BASEPOINT) for i in range(n)]
    fn = sharded_msm_fn(make_mesh())
    s = jnp.asarray(pack_ints(scalars))
    p = ed.from_host(points)
    s, p = pad_for_mesh(s, p, len(jax.devices()))
    out = fn(s, p)
    assert hr.point_equal(ed.to_host(out), host_msm(scalars, points))
