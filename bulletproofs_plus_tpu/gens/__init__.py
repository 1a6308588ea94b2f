"""Deterministic generator sets (bulletproof generator chains, Pedersen bases)."""
