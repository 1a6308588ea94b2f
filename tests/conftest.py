"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU execution is exercised by
bench.py / the driver.

Note: this environment's sitecustomize imports jax at interpreter boot (TPU
tunnel plugin), so env vars alone are too late — the platform must be forced
through jax.config before the first backend query.
"""

import os
import resource

# The XLA CPU compiler recurses deeply on the prover's fused kernels and
# segfaults at the default 8MB stack; let the main-thread stack grow.
try:
    resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):  # pragma: no cover
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic kernels compile slowly on
# XLA CPU; caching makes repeated test runs cheap.  The CPU cache dir is
# keyed by this host's CPU features (utils/envcache.py) — foreign AOT
# artifacts SIGILL this machine / poison dryruns (rounds 1 and 3).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bulletproofs_plus_tpu.utils.envcache import enable_compile_cache  # noqa: E402

enable_compile_cache(cpu=True)

# Optional stdlib line coverage (PEP 669) — scripts/check.sh sets
# BPPT_COVERAGE=1 and gates on scripts/coverage_floor.py afterwards.
_COV = os.environ.get("BPPT_COVERAGE") == "1"
_PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bulletproofs_plus_tpu")

if _COV:
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(_PKG), "scripts"))
    import pycov

    pycov.start(_PKG)

    def pytest_sessionfinish(session, exitstatus):
        out = os.environ.get("BPPT_COVERAGE_OUT", os.path.join(os.path.dirname(_PKG), ".coverage_report.json"))
        # One shard per process: pytest-xdist workers and the controller all
        # run sessionfinish concurrently, so a shared read-modify-write of
        # the report file loses updates (round-3 advisor finding).
        # scripts/coverage_floor.py merges the shards.
        pycov.stop_and_report(_PKG, f"{out}.{os.getpid()}.shard")
