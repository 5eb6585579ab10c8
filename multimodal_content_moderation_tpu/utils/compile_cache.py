"""Persistent XLA compilation cache.

The first jit of the flagship forward costs ~20-40 s of XLA/Mosaic compile
time per (shape, kernel-config) — paid again on every process start. The
reference never faces this (eager torch), but for a serving container or a
CLI that restarts per job it is pure cold-start latency. JAX ships a
persistent on-disk compilation cache keyed on the HLO + compile options +
backend; enabling it turns the second process start's compile into a disk
read (typically <1 s).

Opt-in via either:

- env ``MMHARM_COMPILE_CACHE=/path/to/cache`` (``1``/``true`` selects the
  default ``~/.cache/mmharm/xla``) — honored by every ``mmharm-*`` entry
  point and the serving container, or
- ``enable_compilation_cache(dir)`` from Python before the first jit.

Safe to share between processes (the cache is content-addressed and written
atomically by JAX) and across kernel-knob changes (env-tuned Pallas block
sizes change the serialized kernel, which changes the key). Do NOT share one
cache dir across heterogeneous *CPU* hosts: XLA:CPU AOT entries embed the
compile machine's ISA features and loading them on an older CPU can SIGILL
(XLA logs a feature-mismatch warning). TPU entries are keyed on the device
kind and are fine to share within a fleet of identical chips.
"""

from __future__ import annotations

import os
from typing import Optional

_ENV = "MMHARM_COMPILE_CACHE"
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mmharm", "xla"
)
_enabled_dir: Optional[str] = None


def enable_compilation_cache(
    cache_dir: Optional[str] = None,
    min_compile_time_secs: float = 0.0,
) -> str:
    """Turn on JAX's persistent compilation cache at ``cache_dir``.

    ``min_compile_time_secs=0`` caches every executable (the default 1 s
    threshold would skip the many small host-side jits and still recompile
    them each start). Returns the cache directory. Idempotent; calling with
    a different directory re-points the cache.
    """
    global _enabled_dir
    import jax

    path = os.path.abspath(cache_dir or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        # jax 0.9 latches "cache disabled" the first time a lookup runs with
        # no dir configured; an explicit reset lets a later enable (or a
        # re-point at a different dir) take effect.
        from jax._src import compilation_cache as _jcc

        _jcc.reset_cache()
    except Exception:  # pragma: no cover - private API, best effort
        pass
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    # cache regardless of executable size
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = path
    return path


def maybe_enable_from_env() -> Optional[str]:
    """Honor ``MMHARM_COMPILE_CACHE`` if set (CLI/serving hook).

    Values ``1``/``true``/``yes`` (any case) select the default directory;
    ``0``/``false``/``no``/empty disable; anything else is the directory.
    """
    raw = os.environ.get(_ENV, "").strip()
    if not raw or raw.lower() in ("0", "false", "no"):
        return None
    if raw.lower() in ("1", "true", "yes"):
        return enable_compilation_cache()
    return enable_compilation_cache(raw)


def cache_dir() -> Optional[str]:
    """The directory enabled this process, or None."""
    return _enabled_dir
