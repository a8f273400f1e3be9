"""Persistent XLA compilation cache wiring.

The mapping kernel's cold compile costs tens of seconds per process; the
XLA persistent cache makes repeat CLI/bench runs load the compiled
executable from disk instead.  On this image the `JAX_COMPILATION_CACHE_DIR`
environment variable is READ TOO EARLY to be set from our entry points —
the axon sitecustomize imports jax (and freezes the config's env snapshot)
during interpreter startup, before any of our code runs — so the cache
must be enabled via `jax.config.update`, which works at any point before
the first compile.  (Round-2 note "inert under the axon remote-compile
backend" was wrong for exactly this reason: chip-verified 2026-08-19 that
entries are written and re-loaded once set through jax.config.)

The reference decouples build from serve by serializing the index
(/root/reference/src/bin/pseudoaligner.rs:114,135); the compile artifact
gets the same checkpoint treatment here.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("pseudoaligner_tpu")

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at `cache_dir`.

    Call before the first jit compile (importing jax here is fine — the
    config can be updated any time before compilation).  Returns the
    directory on success, None if the runtime refused (old jax, readonly
    fs, ...); failure is logged and non-fatal — everything still works,
    just with cold compiles.
    """
    cache_dir = (
        cache_dir
        or os.environ.get("PSEUDOALIGNER_JAX_CACHE")
        or _DEFAULT_DIR
    )
    if cache_dir in ("", "0", "off"):
        return None
    try:
        import jax

        # CPU is the test/cross-check backend, not the serving target;
        # XLA's CPU AOT loader also logs loud machine-feature-mismatch
        # errors when re-loading its own entries — skip the cache there.
        # Check the EFFECTIVE config, not just the env var (this image's
        # sitecustomize and the test conftest force platforms through
        # jax.config, where the env var may be absent or stale).
        plats = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
        if str(plats).startswith("cpu"):
            return None
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # the kernel compiles are seconds-to-minutes; cache everything
        # that takes longer than a trivial fusion
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return cache_dir
    except Exception as e:  # pragma: no cover - depends on jax build
        log.debug("compilation cache unavailable: %r", e)
        return None
