"""Proof-system layer: range statements, witnesses, prover, verifier."""
