"""Persistent XLA compilation cache.

MIH search compiles one program per (radius-group, batch-bucket, cap)
combination; cold compiles through a remote-compile tunnel cost tens of
seconds each. The persistent cache makes every later process start warm
(measured 1.3 s -> 0.08 s per program), which matters for CLI tools, the
serving front-end, and repeated benchmark runs.
"""

from __future__ import annotations

import os
import platform

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def _host_fingerprint() -> str:
    """Host/ISA tag for the cache path. XLA:CPU persists AOT-compiled
    executables specialized to the build host's machine features; loading
    one on a different CPU can SIGILL ("machine feature +prefer-no-gather
    is not supported"). Keying the directory by a host fingerprint makes a
    foreign cache entry simply a miss (recompile) instead of a crash."""
    tag = f"{platform.machine()}"
    model = flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith("flags"):
                    flags = line.split(":", 1)[1].strip()
                if model and flags:
                    break
    except OSError:
        pass
    if model:
        tag += "-" + "".join(c if c.isalnum() else "_" for c in model)[:48]
    if flags:
        # same model string != same enabled feature mask (VMs mask
        # features); the AOT executables are specialized to the FLAGS, so
        # hash the full sorted set into the key
        import hashlib
        h = hashlib.sha1(" ".join(sorted(flags.split())).encode())
        tag += "-" + h.hexdigest()[:10]
    return tag


def enable_compilation_cache(path: str = "") -> str:
    import jax

    path = path or os.environ.get("VERTICUT_JAX_CACHE", _DEFAULT_DIR)
    path = os.path.join(path, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
