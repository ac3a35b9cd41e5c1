"""Retry-once wrapper for transient remote-compile failures.

On this rig every XLA compile travels through an HTTP relay
(``/remote_compile``); long compiles occasionally die with
"response body closed before all bytes were read" and similar transport
errors, while the identical call succeeds immediately on retry (observed:
approx k=500 fused compile failed once, succeeded in 30 s on the next
attempt). A benchmark or serving process must not die on that. Only
errors that name the remote-compile transport are retried — real compiler
errors (OOM, lowering bugs) re-raise on the first attempt.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

from verticut_tpu.utils.logging import get_logger

T = TypeVar("T")

_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "connection reset",
    "Connection reset",
    "EOF occurred",
)

#: real compiler verdicts that happen to travel back through the relay
#: (so the message also names the /remote_compile URL) — never retry:
#: the identical program will fail identically, and each wasted attempt
#: costs a full recompile (observed: 2x ~13 s on the 100M k=100 OOM).
_PERMANENT_MARKERS = (
    "Ran out of memory",
    "permanent error",
)


def is_transient_compile_error(exc: BaseException) -> bool:
    msg = str(exc)
    if any(m in msg for m in _PERMANENT_MARKERS):
        return False
    # RESOURCE_EXHAUSTED is permanent only when it is the compiler OOM
    # verdict; a relay throttle/quota error carrying the same status
    # string is transient and must stay retryable (ADVICE r3).
    if "RESOURCE_EXHAUSTED" in msg and (
            "memory" in msg.lower() or "OOM" in msg):
        return False
    return any(m in msg for m in _TRANSIENT_MARKERS)


def with_compile_retry(fn: Callable[[], T], attempts: int = 3,
                       backoff_s: float = 2.0) -> T:
    """Call ``fn``; retry up to ``attempts`` times on transport-level
    remote-compile failures (with linear backoff). Anything else raises
    immediately."""
    import jax  # noqa: F401  (errors module import is lazy below)

    last: BaseException
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered below
            if not is_transient_compile_error(e) or i == attempts - 1:
                raise
            last = e
            get_logger("retry").warning(
                "transient remote-compile failure (attempt %d/%d): %s",
                i + 1, attempts, str(e).splitlines()[-1][:200])
            time.sleep(backoff_s * (i + 1))
    raise last  # pragma: no cover — loop always returns or raises
