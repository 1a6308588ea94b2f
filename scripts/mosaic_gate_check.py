"""Run the pallas Mosaic smoke gate eagerly on the real device and print its
status — the round-4 first-hardware validation of the pallas layer
(round-3 verdict ask #2/#3).

    python scripts/mosaic_gate_check.py

Exercises all three fused kernels (dynamic MSM, fixed-base MSM, pow chain)
through the REAL Mosaic compiler with host-checked values, then prints the
pallas_status() line bench.py records.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

try:
    resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

from bulletproofs_plus_tpu.utils.envcache import enable_compile_cache  # noqa: E402

enable_compile_cache(cpu=jax.default_backend() == "cpu")

from bulletproofs_plus_tpu.ops import pallas_msm  # noqa: E402

t0 = time.perf_counter()
ok = pallas_msm.mosaic_available()
dt = time.perf_counter() - t0
print(json.dumps({"mosaic_available": bool(ok), "gate_seconds": round(dt, 1)}), flush=True)
print(json.dumps(pallas_msm.pallas_status()), flush=True)
