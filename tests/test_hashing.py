"""Tests for the host hashing stack: Keccak, STROBE-128, Merlin, nonces.

These pin the bit-exactness of every Fiat-Shamir byte, which is what makes
proofs interoperable with the reference Rust implementation."""

import hashlib
import os

import numpy as np
import pytest

from bulletproofs_plus_tpu.errors import InvalidLength
from bulletproofs_plus_tpu.ops import host_ristretto as hr
from bulletproofs_plus_tpu.utils import hashing
from bulletproofs_plus_tpu.utils.keccak import keccak_f1600, sha3_256
from bulletproofs_plus_tpu.utils.merlin import NullRng, OsRng, Transcript


def test_keccak_vs_hashlib_sha3():
    for n in [0, 1, 3, 135, 136, 137, 272, 1000]:
        d = os.urandom(n)
        assert sha3_256(d) == hashlib.sha3_256(d).digest()


def test_keccak_batch_matches_single():
    states = np.frombuffer(os.urandom(8 * 25 * 4), dtype=np.uint64).reshape(4, 25)
    out = keccak_f1600(states)
    for i in range(4):
        single = keccak_f1600(states[i : i + 1])
        assert (single[0] == out[i]).all()


def test_merlin_equivalence_vector():
    # Test vector from the merlin crate (merlin/src/transcript.rs,
    # test `equivalence_simple`).
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    c = t.challenge_bytes(b"challenge", 32)
    assert bytes(c[0]).hex() == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_merlin_batch_lockstep():
    tb = Transcript(b"proto", batch=5)
    data = np.frombuffer(os.urandom(5 * 32), dtype=np.uint8).reshape(5, 32)
    tb.append_message(b"pt", data)
    tb.append_u64(b"N", np.arange(5) + 1)
    cb = tb.challenge_bytes(b"y", 64)
    rng = tb.build_rng().finalize(NullRng)
    rb = rng.fill_bytes(64)
    for i in range(5):
        ti = Transcript(b"proto")
        ti.append_message(b"pt", bytes(data[i]))
        ti.append_u64(b"N", i + 1)
        ci = ti.challenge_bytes(b"y", 64)
        ri = ti.build_rng().finalize(NullRng).fill_bytes(64)
        assert (ci[0] == cb[i]).all()
        assert (ri[0] == rb[i]).all()


def test_merlin_stack_and_clone():
    ts = []
    for i in range(3):
        t = Transcript(b"label")
        t.append_message(b"m", bytes([i]) * 4)
        ts.append(t)
    stacked = Transcript.stack([t.clone() for t in ts])
    c = stacked.challenge_bytes(b"c", 32)
    for i, t in enumerate(ts):
        ci = t.challenge_bytes(b"c", 32)
        assert (ci[0] == c[i]).all()


def test_merlin_stack_rejects_mismatched():
    t1 = Transcript(b"a")
    t2 = Transcript(b"a")
    t2.append_message(b"m", b"xx")
    with pytest.raises(ValueError):
        Transcript.stack([t1, t2])


def test_transcript_rng_witness_rekey_changes_output():
    t = Transcript(b"x")
    r1 = t.build_rng().finalize(NullRng).fill_bytes(32)
    r2 = t.build_rng().rekey_with_witness_bytes(b"witness", b"secret").finalize(NullRng).fill_bytes(32)
    assert not (r1 == r2).all()


def test_osrng_shape():
    assert OsRng.fill_bytes(3, 16).shape == (3, 16)


def test_nonce_determinism_and_separation():
    seed = hr.scalar_from_bytes_mod_order_wide(os.urandom(64))
    a = hashing.nonce(seed, "eta")
    b = hashing.nonce(seed, "eta")
    assert a == b
    assert hashing.nonce(seed, "eta") != hashing.nonce(seed, "a")
    assert hashing.nonce(seed, "dL", 1, 2) != hashing.nonce(seed, "dL", 2, 1)
    assert hashing.nonce(seed, "dL", 1, 2) != hashing.nonce(seed, "dR", 1, 2)
    # index domain separation: j-only vs k-only must differ
    assert hashing.nonce(seed, "", 1, None) != hashing.nonce(seed, "", None, 1)
    assert hashing.nonce(seed, "", None, None) != hashing.nonce(seed, "", 1, None)


def test_nonce_label_and_index_limits():
    seed = 12345
    # persona limit is 16 bytes
    for i in range(32):
        label = "a" * i
        if i <= hashing.BLAKE2B_PERSONA_LIMIT:
            hashing.nonce(seed, label, 2**32 - 1, 2**32 - 1)
        else:
            with pytest.raises(InvalidLength):
                hashing.nonce(seed, label)
    # u32 index limit
    with pytest.raises(InvalidLength):
        hashing.nonce(seed, "", 2**32, None)
    with pytest.raises(InvalidLength):
        hashing.nonce(seed, "", None, 2**32)


def test_generators_chain_deterministic_and_prefix_stable():
    pts8 = hashing.generators_chain(b"G\x00\x00\x00\x00", 8)
    pts4 = hashing.generators_chain(b"G\x00\x00\x00\x00", 4)
    for a, b in zip(pts4, pts8):
        assert hr.point_equal(a, b)
    pts_h = hashing.generators_chain(b"H\x00\x00\x00\x00", 4)
    assert not hr.point_equal(pts8[0], pts_h[0])


def test_hash_from_bytes_sha3_512_on_curve():
    p = hashing.hash_from_bytes_sha3_512(b"RISTRETTO_MASKING_BASEPOINT_1")
    # must round-trip through the ristretto codec
    assert hr.point_equal(hr.decompress(hr.compress(p)), p)
