"""Run deep XLA compiles on a thread with a fully-reserved stack.

XLA:CPU compiles synchronously on the CALLING thread, and several of its
optimization passes recurse linearly in the HLO graph depth.  The prover's
fused kernels (models/prover_device.py) trace to graphs deep enough that the
compile needs far more than the default 8 MB stack.

Raising RLIMIT_STACK (tests/conftest.py) is NOT sufficient: the main
thread's stack grows dynamically, and after many compiles in one process an
unrelated mmap can land just below the stack VMA, capping growth below the
rlimit — which is exactly the observed failure mode (the suite's first
prover compile segfaults after ~60 tests, yet the same test passes in a
fresh process).  A worker thread created with an explicit
``threading.stack_size`` has its WHOLE stack mmapped upfront, so the
headroom is guaranteed regardless of address-space fragmentation.

Usage: ``deep_stack_call(fn, *args)`` — run ``fn(*args)`` on such a thread
and return its result (or re-raise its exception).  Used for every batched
prover kernel invocation; compiled-executable caches are process-global in
JAX, so only the first call per shape pays the (tiny) thread cost, and that
call is compile-dominated anyway.
"""

from __future__ import annotations

import functools
import threading

STACK_BYTES = 1 << 30  # 1 GiB reserved (virtual; pages fault in lazily)


def deep_stack_call(fn, *args, **kwargs):
    """Run fn(*args, **kwargs) on a thread with a 1 GiB pre-mapped stack."""
    result: dict = {}

    def run():
        try:
            result["out"] = fn(*args, **kwargs)
        except BaseException as exc:  # noqa: BLE001 - re-raised on the caller
            result["exc"] = exc

    old = threading.stack_size(STACK_BYTES)
    try:
        thread = threading.Thread(target=run, name="bppt-deep-compile")
        thread.start()
    finally:
        threading.stack_size(old)
    thread.join()
    if "exc" in result:
        raise result["exc"]
    return result["out"]


def deep_jit(fn):
    """Route every call of an (already-jitted) top-level kernel through the
    1 GiB-stack thread.

    Apply ONLY to kernels invoked eagerly (never inside another trace:
    tracer contexts are thread-local, so calling a wrapped fn with tracers
    would escape its trace).  Dispatch of an already-compiled executable is
    async and ~0.1 ms of thread cost per call — negligible next to the
    kernels this guards (fused verifier/prover graphs whose first-compile
    otherwise overflows the main thread's stack; see module docstring).
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return deep_stack_call(fn, *args, **kwargs)

    wrapper.__wrapped__ = fn
    return wrapper
