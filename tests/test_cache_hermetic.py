"""Persistent-compile-cache safety (round-5 SIGABRT fix).

Round 4's verdict reduced a full-suite `Fatal Python error: Aborted` to a
deterministic 2-test repro: an in-process eval-CLI test called
``enable_compilation_cache()``, repointing every later compile in the
process at the on-disk cache, and a later jitted topo-device DP train step
aborted the process (SIGABRT, rc=134). Round-5 isolation: the abort does
NOT require foreign (cross-host) entries — enabling a freshly-created
per-session tmp cache for the suite reproduces the abort at the same test
(first topo-device DP train step, after ~13 tests' programs were written),
and the identical run with the cache disabled is green. Loading CPU AOT
executables back from XLA's persistent cache is itself unsafe here (XLA's
own warning: CPU AOT cache keys do not fully capture machine features; a
mismatch "could lead to execution errors such as SIGILL").

The fix, each leg covered below:

  (a) ``enable_compilation_cache`` is a NO-OP on the CPU backend (unless
      ``DHOCT_COMPILATION_CACHE_FORCE=1``), so an in-process CLI can never
      arm the hazard for later compiles;
  (b) conftest pins ``DHOCT_COMPILATION_CACHE`` to a per-session tmp dir
      and never sets ``jax_compilation_cache_dir`` — defense in depth: a
      force-enabled cache still cannot reach the shared user-level dir;
  (c) on non-CPU backends the cache engages under a host/toolchain
      fingerprint subdirectory, so a cache root shared across
      heterogeneous hosts cannot serve a foreign executable;
  (d) the round-4 2-test repro sequence runs green in a subprocess
      (slow-marked).

Reference behavior being protected: the per-step jitted training compile,
training_utils.py:55 in the reference's loop.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax
import pytest

from dilabhelmholtzoct_tpu.utils.cache import (
    cache_fingerprint,
    enable_compilation_cache,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _current_cache_dir() -> str | None:
    return jax.config.jax_compilation_cache_dir


def test_suite_runs_without_persistent_cache():
    # Leg (a)+(b): the suite never has a persistent cache configured, and
    # the hermetic root is pinned away from the shared user-level cache.
    assert _current_cache_dir() is None
    pinned = os.environ.get("DHOCT_COMPILATION_CACHE", "")
    shared = os.path.join(
        os.path.expanduser("~"), ".cache", "dilabhelmholtzoct_tpu"
    )
    assert pinned and not pinned.startswith(shared)


def test_enable_is_noop_on_cpu_backend(tmp_path):
    # Leg (a): the exact round-4 hazard — an in-process CLI enabling the
    # cache — must not change the compile configuration on CPU.
    before = _current_cache_dir()
    enable_compilation_cache(str(tmp_path))
    assert _current_cache_dir() == before
    assert not os.path.isdir(tmp_path / cache_fingerprint())


def test_fingerprint_deterministic_and_feature_sensitive(monkeypatch):
    fp1 = cache_fingerprint()
    assert fp1 == cache_fingerprint()
    assert len(fp1) == 16 and all(c in "0123456789abcdef" for c in fp1)
    # Different XLA_FLAGS must key a different cache subdirectory: AOT
    # entries are flag-dependent.
    monkeypatch.setenv(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_enable_fast_math=false",
    )
    assert cache_fingerprint() != fp1


def test_forced_enable_uses_fingerprint_subdir(tmp_path, monkeypatch):
    # Leg (c), exercised via the force override since tests run on CPU:
    # the TPU-path behavior is the same code.
    before = _current_cache_dir()
    monkeypatch.setenv("DHOCT_COMPILATION_CACHE_FORCE", "1")
    try:
        enable_compilation_cache(str(tmp_path))
        live = _current_cache_dir()
        assert live == str(tmp_path / cache_fingerprint())
        assert os.path.isdir(live)
        # Default root (no arg): honors the conftest-pinned env override —
        # even a forced enable cannot escape the hermetic session dir.
        enable_compilation_cache()
        live = _current_cache_dir()
        assert live.startswith(os.environ["DHOCT_COMPILATION_CACHE"])
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_disable_env_wins_over_force(tmp_path, monkeypatch):
    before = _current_cache_dir()
    monkeypatch.setenv("DHOCT_COMPILATION_CACHE_FORCE", "1")
    monkeypatch.setenv("DHOCT_COMPILATION_CACHE_DISABLE", "1")
    enable_compilation_cache(str(tmp_path))
    assert _current_cache_dir() == before
    assert not os.path.isdir(tmp_path / cache_fingerprint())


@pytest.mark.slow
def test_repro_sequence_green_in_one_process(tmp_path):
    """Leg (d): the exact round-4 crash sequence, in one fresh process.

    Without the fix this aborts with SIGABRT (rc=134) in the first jitted
    topo-device DP train step; with it both tests pass. HOME is redirected
    so the subprocess cannot read a pre-poisoned shared cache — what is
    being proven is that the CLI test no longer arms the persistent cache
    for later compiles.
    """
    env = dict(os.environ)
    env["HOME"] = str(tmp_path)
    env.pop("DHOCT_COMPILATION_CACHE", None)  # let the child conftest pin it
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "-q",
            "-p",
            "no:cacheprovider",
            "tests/test_inference.py::test_eval_cli",
            "tests/test_training.py::test_topo_device_data_parallel",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
