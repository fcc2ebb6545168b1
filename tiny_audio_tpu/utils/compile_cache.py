"""Persistent XLA compilation cache wiring for production entrypoints.

Flagship serving/training graphs cost minutes of XLA compile on first
trace (a cold ``handler.warmup(batched=True)`` compiles ~21 graphs).  JAX
can persist compiled executables to disk and reload them across process
restarts, making the *second* boot compile ~nothing — but only if
``jax_compilation_cache_dir`` is set before the first compilation.  The
reference leans on torch.compile's local inductor cache for the same
effect (``/root/reference/configs/training/production.yaml:76-80``); on
TPU the JAX persistent cache is the equivalent and it must be wired into
every long-lived entrypoint, not just benchmarks.

Called from: ``EndpointHandler.__init__`` (covers ``serving.serve`` and
any embedding), the ``ta`` CLI dispatcher, and ``Trainer.__init__``.

Resolution order for the cache directory:
  1. ``TA_JAX_CACHE_DIR`` env var (``"0"``/``"off"``/``""`` disables);
  2. repo-local ``.jax_cache`` next to the package (dev checkouts — this
     is where bench scripts already point, so entrypoints share it);
  3. ``~/.cache/tiny_audio_tpu/jax_cache`` (installed packages).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_DISABLE = {"0", "off", "false", "no", ""}
_enabled_dir: Optional[str] = None


def default_cache_dir() -> Optional[str]:
    env = os.environ.get("TA_JAX_CACHE_DIR")
    if env is not None:
        return None if env.strip().lower() in _DISABLE else env
    repo_local = Path(__file__).resolve().parents[2] / ".jax_cache"
    # A dev checkout has pyproject.toml next to the package; an installed
    # wheel lands in site-packages where a stray .jax_cache would be odd.
    if (repo_local.parent / "pyproject.toml").is_file():
        return str(repo_local)
    return str(Path.home() / ".cache" / "tiny_audio_tpu" / "jax_cache")


def enable_persistent_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent and safe after JAX is initialized (the config flags are
    read per-compilation).  Returns the directory in effect, or ``None``
    when disabled.  Never raises: serving/training must not die because a
    cache dir is unwritable — the cost is recompilation, not correctness.
    """
    global _enabled_dir
    explicit = cache_dir is not None or os.environ.get("TA_JAX_CACHE_DIR")
    cache_dir = cache_dir if cache_dir is not None else default_cache_dir()
    if cache_dir is None:
        return _enabled_dir
    if _enabled_dir == cache_dir:
        return _enabled_dir
    if not explicit:
        # CPU-pinned processes (tests, virtual-mesh dryruns) skip the cache:
        # CPU entries are AOT results whose LLVM machine features are baked
        # in at compile time, and this cache directory outlives the host —
        # xla's cpu_aot_loader warns that loading an entry compiled under
        # different features "could lead to execution errors such as
        # SIGILL".  CPU compiles are seconds anyway; the cache exists for
        # the minutes-long TPU graphs.  Checked via the jax_platforms
        # CONFIG value (never initializes a backend — entrypoints call this
        # before first device touch, and backend init hangs when the
        # remote-TPU tunnel is down).
        try:
            import jax

            platforms = (jax.config.jax_platforms or "").lower()
        except Exception:  # pragma: no cover - defensive
            platforms = ""
        if platforms.split(",")[0] == "cpu":
            return None
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist anything that took real compile time; tiny graphs churn
        # the directory for no restart win.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled_dir = cache_dir
    except Exception as e:  # pragma: no cover - defensive
        print(f"[compile-cache] disabled ({type(e).__name__}: {e})")
        return None
    return _enabled_dir
