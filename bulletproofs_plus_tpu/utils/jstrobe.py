"""Traced (in-jit) STROBE-128 + Merlin transcripts.

The numpy layer (utils/strobe.py, utils/merlin.py) advances B sponges on
host; this mirror advances them INSIDE a jitted program.  The trick that
makes it cheap: for a fixed proof shape the transcript op sequence — labels,
lengths, framing — is completely static, so sponge positions, begin markers
and flags are plain Python ints resolved at trace time.  The compiled graph
contains only slice XOR/updates and keccak scans; there is no data-dependent
control flow (exactly what XLA wants, SURVEY.md §7 hard part 2).

Bit-exactness contract: given the same inputs, `JStrobe` produces the same
state bytes as `strobe.Strobe128` (pinned by tests/test_jstrobe.py); Merlin
framing matches utils/merlin.py and hence the merlin crate.
"""

from __future__ import annotations

from typing import List, Union

import jax.numpy as jnp
import numpy as np

from .jkeccak import bytes_to_state, keccak_f1600, state_to_bytes
from .strobe import FLAG_A, FLAG_C, FLAG_I, FLAG_K, FLAG_M, FLAG_T, STROBE_R

Data = Union[bytes, np.ndarray, jnp.ndarray]


def _le32(n: int) -> bytes:
    return int(n).to_bytes(4, "little")


def _data_len(data: Data) -> int:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return len(data)
    return int(data.shape[-1])


class JStrobe:
    """A batch of B STROBE-128 states as a traced (B, 200) uint8 array."""

    __slots__ = ("state", "pos", "pos_begin", "cur_flags")

    def __init__(self, state: jnp.ndarray, pos: int = 0, pos_begin: int = 0, cur_flags: int = 0):
        self.state = state
        self.pos = pos
        self.pos_begin = pos_begin
        self.cur_flags = cur_flags

    @staticmethod
    def from_host(strobe) -> "JStrobe":
        """Snapshot a host strobe.Strobe128 (its array becomes a jit input
        or constant)."""
        return JStrobe(jnp.asarray(strobe.state), strobe.pos, strobe.pos_begin, strobe.cur_flags)

    def clone(self) -> "JStrobe":
        return JStrobe(self.state, self.pos, self.pos_begin, self.cur_flags)

    @property
    def batch(self) -> int:
        return self.state.shape[0]

    # -- core sponge -----------------------------------------------------------

    def _run_f(self) -> None:
        s = self.state
        s = s.at[:, self.pos].set(s[:, self.pos] ^ np.uint8(self.pos_begin))
        s = s.at[:, self.pos + 1].set(s[:, self.pos + 1] ^ np.uint8(0x04))
        s = s.at[:, STROBE_R + 1].set(s[:, STROBE_R + 1] ^ np.uint8(0x80))
        self.state = state_to_bytes(keccak_f1600(bytes_to_state(s)))
        self.pos = 0
        self.pos_begin = 0

    def _chunk(self, data: Data, off: int, k: int):
        if isinstance(data, (bytes, bytearray, memoryview)):
            return np.frombuffer(bytes(data[off : off + k]), dtype=np.uint8)
        return data[..., off : off + k]

    def _absorb(self, data: Data) -> None:
        off, n = 0, _data_len(data)
        while off < n:
            k = min(STROBE_R - self.pos, n - off)
            sl = self.state[:, self.pos : self.pos + k]
            self.state = self.state.at[:, self.pos : self.pos + k].set(
                sl ^ self._chunk(data, off, k)
            )
            self.pos += k
            off += k
            if self.pos == STROBE_R:
                self._run_f()

    def _overwrite(self, data: Data) -> None:
        off, n = 0, _data_len(data)
        while off < n:
            k = min(STROBE_R - self.pos, n - off)
            chunk = self._chunk(data, off, k)
            if not hasattr(chunk, "ndim") or chunk.ndim == 1:
                chunk = jnp.broadcast_to(jnp.asarray(chunk, jnp.uint8), (self.batch, k))
            self.state = self.state.at[:, self.pos : self.pos + k].set(chunk)
            self.pos += k
            off += k
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int) -> jnp.ndarray:
        outs: List[jnp.ndarray] = []
        off = 0
        while off < n:
            k = min(STROBE_R - self.pos, n - off)
            outs.append(self.state[:, self.pos : self.pos + k])
            self.state = self.state.at[:, self.pos : self.pos + k].set(jnp.uint8(0))
            self.pos += k
            off += k
            if self.pos == STROBE_R:
                self._run_f()
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)

    def _begin_op(self, flags: int, more: bool) -> None:
        if more:
            assert flags == self.cur_flags, "continued op flag mismatch"
            return
        assert not flags & FLAG_T, "transport flags not supported"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]))
        if flags & (FLAG_C | FLAG_K) and self.pos != 0:
            self._run_f()

    # -- Merlin subset -----------------------------------------------------------

    def meta_ad(self, data: Data, more: bool) -> None:
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb(data)

    def ad(self, data: Data, more: bool) -> None:
        self._begin_op(FLAG_A, more)
        self._absorb(data)

    def prf(self, n: int, more: bool) -> jnp.ndarray:
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)

    def key(self, data: Data, more: bool) -> None:
        self._begin_op(FLAG_A | FLAG_C, more)
        self._overwrite(data)


class JTranscript:
    """Traced Merlin transcript over a JStrobe (framing per utils/merlin.py)."""

    __slots__ = ("strobe",)

    def __init__(self, strobe: JStrobe):
        self.strobe = strobe

    @staticmethod
    def from_host(transcript) -> "JTranscript":
        return JTranscript(JStrobe.from_host(transcript.strobe))

    def clone(self) -> "JTranscript":
        return JTranscript(self.strobe.clone())

    def append_message(self, label: bytes, message: Data) -> None:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_le32(_data_len(message)), True)
        self.strobe.ad(message, False)

    def append_u64(self, label: bytes, value: Data) -> None:
        """value: int (broadcast constant) or (B, 8) uint8 little-endian."""
        if isinstance(value, int):
            self.append_message(label, value.to_bytes(8, "little"))
        else:
            self.append_message(label, value)

    def challenge_bytes(self, label: bytes, n: int) -> jnp.ndarray:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_le32(n), True)
        return self.strobe.prf(n, False)

    def build_rng(self) -> "JTranscriptRngBuilder":
        return JTranscriptRngBuilder(self.strobe.clone())


class JTranscriptRngBuilder:
    __slots__ = ("strobe",)

    def __init__(self, strobe: JStrobe):
        self.strobe = strobe

    def rekey_with_witness_bytes(self, label: bytes, witness: Data) -> "JTranscriptRngBuilder":
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_le32(_data_len(witness)), True)
        self.strobe.key(witness, False)
        return self

    def finalize_null(self) -> "JTranscriptRng":
        """finalize(NullRng): key 32 zero bytes (nullrng.rs parity)."""
        self.strobe.meta_ad(b"rng", False)
        self.strobe.key(bytes(32), False)
        return JTranscriptRng(self.strobe)

    def finalize_with(self, random_bytes: Data) -> "JTranscriptRng":
        """finalize(rng) with the external RNG's 32 bytes pre-drawn on host
        and passed in as a (B, 32) array — how a fully-device prover keeps
        bit-exactness with the host prover's RNG stream."""
        self.strobe.meta_ad(b"rng", False)
        self.strobe.key(random_bytes, False)
        return JTranscriptRng(self.strobe)


class JTranscriptRng:
    __slots__ = ("strobe",)

    def __init__(self, strobe: JStrobe):
        self.strobe = strobe

    def fill_bytes(self, n: int) -> jnp.ndarray:
        self.strobe.meta_ad(_le32(n), False)
        return self.strobe.prf(n, False)
