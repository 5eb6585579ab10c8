"""Persistent XLA compilation cache (utils/compile_cache).

The reference has no compile step at all (eager torch); here the first jit
of the flagship forward costs tens of seconds, so the serving container and
CLIs expose MMHARM_COMPILE_CACHE to persist executables across process
starts. These tests pin the env parsing and that enabling the cache actually
writes executables to disk on this backend.
"""

import os

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.utils import compile_cache


def test_enable_writes_cache_entries(tmp_path):
    d = compile_cache.enable_compilation_cache(str(tmp_path / "xla"))
    try:
        assert os.path.isdir(d)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        f(jnp.ones((67, 33), jnp.float32)).block_until_ready()
        entries = os.listdir(d)
        assert entries, "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_second_compile_hits_cache(tmp_path):
    d = compile_cache.enable_compilation_cache(str(tmp_path / "xla"))
    try:

        def g(x):
            return jnp.sin(x) * 3.0 + x

        jax.jit(g)(jnp.ones((41, 7))).block_until_ready()
        g_entries = [e for e in os.listdir(d) if e.startswith("jit_g-")]
        assert len(g_entries) == 1
        # a fresh jit wrapper of the same function recompiles from the
        # in-process trace but must be served by the one persistent entry,
        # not write a second one (auxiliary helper jits like
        # convert_element_type may add their own entries — ignore those)
        jax.clear_caches()
        jax.jit(g)(jnp.ones((41, 7))).block_until_ready()
        assert [e for e in os.listdir(d) if e.startswith("jit_g-")] == g_entries
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_env_parsing(tmp_path, monkeypatch):
    monkeypatch.delenv("MMHARM_COMPILE_CACHE", raising=False)
    assert compile_cache.maybe_enable_from_env() is None

    monkeypatch.setenv("MMHARM_COMPILE_CACHE", "0")
    assert compile_cache.maybe_enable_from_env() is None
    monkeypatch.setenv("MMHARM_COMPILE_CACHE", "false")
    assert compile_cache.maybe_enable_from_env() is None

    target = str(tmp_path / "cc")
    monkeypatch.setenv("MMHARM_COMPILE_CACHE", target)
    try:
        got = compile_cache.maybe_enable_from_env()
        assert got == os.path.abspath(target)
        assert os.path.isdir(got)
        assert compile_cache.cache_dir() == got
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
