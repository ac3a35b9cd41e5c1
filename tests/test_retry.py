"""Transient remote-compile retry wrapper (utils/retry.py)."""

import pytest

from verticut_tpu.utils.retry import (is_transient_compile_error,
                                      with_compile_retry)


def test_transient_classification():
    assert is_transient_compile_error(RuntimeError(
        "INTERNAL: http://127.0.0.1:8103/remote_compile: read body: "
        "response body closed before all bytes were read"))
    assert not is_transient_compile_error(RuntimeError(
        "RESOURCE_EXHAUSTED: out of memory allocating 4.0G"))
    assert not is_transient_compile_error(ValueError("shape mismatch"))
    # a real compiler OOM travels back through the relay, so the message
    # also names the /remote_compile URL — must NOT be retried
    assert not is_transient_compile_error(RuntimeError(
        "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500: "
        "XLA:TPU compile permanent error. Ran out of memory in memory "
        "space hbm. Used 15.80G of 15.75G hbm."))


def test_retries_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("remote_compile: response body closed")
        return 42

    assert with_compile_retry(flaky, backoff_s=0.0) == 42
    assert len(calls) == 2


def test_non_transient_raises_immediately():
    calls = []

    def broken():
        calls.append(1)
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        with_compile_retry(broken, backoff_s=0.0)
    assert len(calls) == 1


def test_exhausted_attempts_raise():
    def always_flaky():
        raise RuntimeError("remote_compile: connection reset")

    with pytest.raises(RuntimeError):
        with_compile_retry(always_flaky, attempts=2, backoff_s=0.0)
