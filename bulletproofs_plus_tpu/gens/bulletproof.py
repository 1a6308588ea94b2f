"""Bulletproof generator vectors G_i / H_i with device-resident precomputation.

Replaces the reference's `BulletproofGens`
(/root/reference/src/generators/bulletproof_gens.rs:42-134): per-party
SHAKE256 generator chains, the aggregated iterator
(aggregated_gens_iter.rs:10-43), and the interleaved fixed-base
precomputation handle (`Precomputable`, traits.rs:40-43).

TPU-native design: instead of an iterator + opaque dalek precomputation
object, the generators are materialised once as device `PointArray`s (the
interleaved [G_0 H_0 G_1 H_1 ...] layout the final MSM consumes) and cached;
the host tuples remain available for setup-time host math.
"""

from __future__ import annotations

from typing import List

from ..errors import SizeOverflow
from ..ops import host_ristretto as hr
from ..utils.hashing import generators_chain, party_label


class BulletproofGens:
    """All G_i / H_i generators for up to `party_capacity` parties with up to
    `gens_capacity` bits each."""

    __slots__ = (
        "gens_capacity",
        "party_capacity",
        "g_vec",
        "h_vec",
        "_interleaved_device",
        "_fixed_tables",
        "_fixed_tables_sliced",
    )

    def __init__(self, gens_capacity: int, party_capacity: int):
        if party_capacity > 0xFFFFFFFF:
            raise SizeOverflow("party capacity overflows u32 labels")
        self.gens_capacity = gens_capacity
        self.party_capacity = party_capacity
        # Per-party chains, labels "G"+LE32(i) / "H"+LE32(i)
        # (/root/reference/src/generators/bulletproof_gens.rs:88-97).
        self.g_vec: List[List[hr.Point]] = [
            generators_chain(party_label(ord("G"), i), gens_capacity) for i in range(party_capacity)
        ]
        self.h_vec: List[List[hr.Point]] = [
            generators_chain(party_label(ord("H"), i), gens_capacity) for i in range(party_capacity)
        ]
        self._interleaved_device = None
        self._fixed_tables = None
        self._fixed_tables_sliced = {}

    def g_iter(self, n: int, m: int) -> List[hr.Point]:
        """First n of each of the first m parties' G generators, flattened."""
        return [g for party in self.g_vec[:m] for g in party[:n]]

    def h_iter(self, n: int, m: int) -> List[hr.Point]:
        return [h for party in self.h_vec[:m] for h in party[:n]]

    def interleaved(self) -> List[hr.Point]:
        """[G_0, H_0, G_1, H_1, ...] over the full capacity — the static-point
        layout of the precomputation tables
        (/root/reference/src/generators/bulletproof_gens.rs:100-103)."""
        g_flat = [g for party in self.g_vec for g in party]
        h_flat = [h for party in self.h_vec for h in party]
        out: List[hr.Point] = []
        for g, h in zip(g_flat, h_flat):
            out.append(g)
            out.append(h)
        return out

    def interleaved_device(self):
        """Device PointArray of the interleaved generators (cached)."""
        if self._interleaved_device is None:
            from ..ops.edwards import from_host

            self._interleaved_device = from_host(self.interleaved())
        return self._interleaved_device

    def fixed_tables(self):
        """Precomputed 4-bit digit tables over the interleaved generators —
        the `Precomputable` analog (traits.rs:40-43); built once, cached in
        HBM (256 KB per generator)."""
        if self._fixed_tables is None:
            from ..ops.fixed_base import build_tables

            self._fixed_tables = build_tables(self.interleaved_device())
        return self._fixed_tables

    def fixed_tables_sliced(self, n_static: int):
        """Tables restricted to the first n_static interleaved generators
        (cached per size — avoids re-slicing multi-MB arrays every verify)."""
        if n_static not in self._fixed_tables_sliced:
            full = self.fixed_tables()
            self._fixed_tables_sliced[n_static] = type(full)(
                *(c[:, :, :n_static] for c in full)
            )
        return self._fixed_tables_sliced[n_static]
