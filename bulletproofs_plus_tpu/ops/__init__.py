"""Compute kernels: limb field arithmetic, Edwards/Ristretto group ops, MSM."""
