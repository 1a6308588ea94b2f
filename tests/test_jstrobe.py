"""Traced (in-jit) STROBE/Merlin vs the numpy host implementation —
bit-exactness over a representative op sequence (the replay's op mix)."""

import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np

from bulletproofs_plus_tpu.utils import jkeccak
from bulletproofs_plus_tpu.utils.jstrobe import JStrobe, JTranscript
from bulletproofs_plus_tpu.utils.keccak import bytes_as_states, keccak_f1600, states_as_bytes
from bulletproofs_plus_tpu.utils.merlin import NullRng, Transcript


def test_jkeccak_matches_host():
    rng = np.random.default_rng(7)
    st = rng.integers(0, 256, size=(3, 200), dtype=np.uint8)
    host = states_as_bytes(keccak_f1600(bytes_as_states(st.copy())))
    dev = jax.jit(lambda s: jkeccak.state_to_bytes(jkeccak.keccak_f1600(jkeccak.bytes_to_state(s))))(
        jnp.asarray(st)
    )
    assert np.array_equal(host, np.asarray(dev))


def test_jtranscript_matches_host():
    B = 4
    rng = np.random.default_rng(13)
    msgs = rng.integers(0, 256, size=(3, B, 32), dtype=np.uint8)
    wit = rng.integers(0, 256, size=(B, 40), dtype=np.uint8)

    # Host reference
    t = Transcript(b"jstrobe-test", batch=B)
    t.append_message(b"dom-sep", b"proto")
    t.append_u64(b"N", 64)
    for m in msgs:
        t.append_message(b"P", m)
    c_host = t.challenge_bytes(b"y", 64)
    rng_host = (
        t.build_rng().rekey_with_witness_bytes(b"witness", wit).finalize(NullRng())
    )
    draw_host = rng_host.fill_bytes(32)
    c2_host = t.challenge_bytes(b"e", 64)  # transcript unaffected by rng build

    # Traced mirror — one jit, same sequence (sponge position of the input
    # transcript is a trace-time constant, like replay_device does it)
    t0 = Transcript(b"jstrobe-test", batch=B)
    pos, pos_begin, cur_flags = t0.strobe.pos, t0.strobe.pos_begin, t0.strobe.cur_flags

    def traced(state, msgs, wit, u64s):
        jt = JTranscript(JStrobe(state, pos, pos_begin, cur_flags))
        jt.append_message(b"dom-sep", b"proto")
        jt.append_u64(b"N", u64s)
        for i in range(msgs.shape[0]):
            jt.append_message(b"P", msgs[i])
        c = jt.challenge_bytes(b"y", 64)
        jrng = jt.build_rng().rekey_with_witness_bytes(b"witness", wit).finalize_null()
        draw = jrng.fill_bytes(32)
        c2 = jt.challenge_bytes(b"e", 64)
        return c, draw, c2

    u64s = np.full((B, 8), 0, dtype=np.uint8)
    u64s[:, 0] = 64
    c_dev, draw_dev, c2_dev = jax.jit(traced)(
        jnp.asarray(t0.strobe.state), jnp.asarray(msgs), jnp.asarray(wit), jnp.asarray(u64s)
    )
    assert np.array_equal(c_host, np.asarray(c_dev))
    assert np.array_equal(draw_host, np.asarray(draw_dev))
    assert np.array_equal(c2_host, np.asarray(c2_dev))
