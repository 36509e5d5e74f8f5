"""JAX persistent compilation cache setup.

The axon TPU runtime compiles remotely (tens of seconds per program, with
high variance); caching compiled executables on disk makes every repeat
invocation of the CLIs/bench start in seconds.

Safety (round 5): the persistent cache is DISABLED on the CPU backend.
Round 4's verdict reduced a full-suite `Fatal Python error: Aborted` to a
2-test repro (eval CLI enabling the cache, then a topo-device DP train
step); round 5 isolated the trigger further: with a per-session, freshly
created, same-machine cache directory, the test suite STILL aborts
(SIGABRT, rc=134) in the first topo-device DP train step once enough
prior programs have been written — loading CPU AOT executables back from
the persistent cache is itself unsafe in this environment, not only
cross-host entries (XLA's own warning: CPU AOT keys do not fully capture
machine features and a mismatch "could lead to execution errors such as
SIGILL"). The identical run with the cache disabled is green
(tests/test_cache_hermetic.py pins both facts). The cache's value is on
the axon TPU backend anyway (remote compiles are tens of seconds; TPU
executables are not host-CPU AOT code), so:

* CPU backend: no-op unless ``DHOCT_COMPILATION_CACHE_FORCE=1``.
* TPU/other backends: enabled, under a host/toolchain-fingerprint
  subdirectory (jax + jaxlib versions, platform selection, XLA_FLAGS,
  host CPU model+flags) so a cache root shared across heterogeneous
  hosts can never serve a foreign executable.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "dilabhelmholtzoct_tpu", "xla"
)


def _host_cpu_signature() -> str:
    """Model name + feature flags of CPU 0 — the features AOT code targets."""
    try:
        model, flags = "", ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith(("flags", "Features")):
                    # sort: flag *set* matters, kernel ordering does not
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if model and flags:
                    break
        return f"{model}|{flags}"
    except OSError:  # non-Linux fallback: coarse but still per-arch
        return platform.processor() or platform.machine()


def cache_fingerprint() -> str:
    """Hex digest identifying (toolchain, platform config, host CPU).

    Deliberately does NOT initialize a JAX backend: under the axon tunnel
    backend init can take minutes, and the hazard being keyed out is
    host-CPU AOT feature mismatch, which the inputs below fully determine.
    """
    import jax

    try:
        import jaxlib

        jaxlib_ver = getattr(jaxlib, "__version__", "?")
    except ImportError:  # pragma: no cover
        jaxlib_ver = "?"
    parts = [
        jax.__version__,
        jaxlib_ver,
        platform.machine(),
        os.environ.get("JAX_PLATFORMS", ""),
        str(getattr(jax.config, "jax_platforms", None) or ""),
        os.environ.get("XLA_FLAGS", ""),
        _host_cpu_signature(),
    ]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _cpu_backend_selected() -> bool:
    """True when JAX is/will be on the CPU backend, WITHOUT initializing
    one (axon TPU backend init can take minutes on a cold tunnel)."""
    import jax

    sel = (str(getattr(jax.config, "jax_platforms", None) or "")
           or os.environ.get("JAX_PLATFORMS", ""))
    return sel.split(",")[0].strip().lower() == "cpu"


def enable_compilation_cache(directory: str | None = None) -> None:
    """Point JAX's persistent compile cache at a fingerprinted directory.

    No-op on the CPU backend (see module docstring — loading CPU AOT cache
    entries aborts the process in this environment) unless
    ``DHOCT_COMPILATION_CACHE_FORCE=1``. ``DHOCT_COMPILATION_CACHE_DISABLE=1``
    makes it a no-op everywhere.

    Directory precedence: explicit ``directory`` arg >
    ``DHOCT_COMPILATION_CACHE`` env var (the test suite pins this to a
    per-session tmp dir for hermeticity) >
    ``~/.cache/dilabhelmholtzoct_tpu/xla``. The fingerprint subdirectory is
    always appended, so even an explicitly shared root is safe across
    hosts.
    """
    if os.environ.get("DHOCT_COMPILATION_CACHE_DISABLE", "") == "1":
        return
    if (_cpu_backend_selected()
            and os.environ.get("DHOCT_COMPILATION_CACHE_FORCE", "") != "1"):
        return
    import jax

    root = directory or os.environ.get("DHOCT_COMPILATION_CACHE", _DEFAULT_DIR)
    cache_dir = os.path.join(root, cache_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
