"""Persistent-compile-cache setup shared by tests, bench.py and the driver
entry points.

Two hazards this module encodes (both observed, see CLAUDE.md):

* CPU artifacts are only valid on the machine that compiled them — the TPU
  tunnel's host has a newer CPU and its AOT XLA:CPU executables SIGILL this
  machine (round 1), and a stale foreign entry poisoned the round-3
  multichip dryrun with feature-mismatch warnings.  The CPU cache directory
  is therefore KEYED BY THE HOST'S CPU FEATURE SET: a run on any other
  machine lands in a different directory and can never poison this one.
* TPU artifacts (tunnel runs) live in a separate, unkeyed `.jax_cache` —
  they are compiled for the TPU target and safe to share.
"""

from __future__ import annotations

import hashlib
import os


def cpu_feature_tag() -> str:
    """Stable 8-hex-char digest of this host's CPU feature flags."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not flags:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha256(flags.encode()).hexdigest()[:8]


def _cache_root() -> str:
    root = os.environ.get("BPPT_CACHE_ROOT")
    if root:
        return root
    # package/utils/envcache.py -> repo root two levels above the package
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if os.access(pkg_parent, os.W_OK):
        return pkg_parent
    return os.path.join(os.path.expanduser("~"), ".cache", "bulletproofs_plus_tpu")


def cache_dir(cpu: bool = False) -> str:
    name = f".jax_cache_cpu_{cpu_feature_tag()}" if cpu else ".jax_cache"
    return os.path.join(_cache_root(), name)


def enable_compile_cache(cpu: bool = False) -> str:
    """Point JAX's persistent compilation cache at the right directory and
    return it.  Call after `import jax` (any time; the setting is read per
    compile)."""
    import jax

    d = cache_dir(cpu)
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return d
