"""Cold-start attribution: capture jax compile/cache events.

VERDICT r3 #1: the official bench showed a 487.7s "first batch" with a
tune-cache hit and a 0.1s backend claim — the repo could not say whether
the residual was its own compile or the axon backend's server-side
program load.  This monitor captures jax's internal log events
(persistent-cache hit/miss per executable, tracing / lowering / XLA
compile durations) so bench.py can emit a machine-readable setup
breakdown, and `probe_backend` times a trivial jitted program — the
minimal repro separating backend/tunnel cost from kernel-compile cost
(a trivial program has ~0.4s of compile and ~no bytes; anything beyond
that is the backend's claim/load/dispatch path).

Reference analog: the index/serve decoupling of
/root/reference/src/bin/pseudoaligner.rs:114,135 applied to the compile
artifact (jaxcache.py) plus this instrumentation to prove where the
residual lives.
"""

from __future__ import annotations

import logging
import re
import time

_WATCHED = (
    "jax._src.compiler",
    "jax._src.interpreters.pxla",
    "jax._src.dispatch",
)

_PATTERNS = (
    ("cache_hit", re.compile(r"Persistent compilation cache hit for '([^']+)'")),
    ("cache_miss", re.compile(r"PERSISTENT COMPILATION CACHE MISS for '([^']+)'")),
    ("trace", re.compile(r"Finished tracing \+ transforming (\S+).* in ([0-9.e+-]+) sec")),
    ("lower", re.compile(r"Finished jaxpr to MLIR module conversion (\S+) in ([0-9.e+-]+) sec")),
    ("compile", re.compile(r"Finished XLA compilation of (\S+) in ([0-9.e+-]+) sec")),
)


class JitEventMonitor:
    """Attach to jax's compiler/dispatch loggers and collect cache and
    phase events.  start()/stop() save and restore logger state;
    propagation is muted while active so DEBUG records don't flood the
    process's stderr handlers."""

    def __init__(self):
        self.events: list[tuple[float, str, str, float | None]] = []
        self._saved: list[tuple[logging.Logger, int, bool]] = []
        self._handler: logging.Handler | None = None

    def start(self) -> "JitEventMonitor":
        mon = self

        class _H(logging.Handler):
            def emit(self, rec):
                msg = rec.getMessage()
                for kind, pat in _PATTERNS:
                    m = pat.search(msg)
                    if m:
                        dur = (float(m.group(2))
                               if m.lastindex and m.lastindex >= 2 else None)
                        mon.events.append(
                            (time.time(), kind, m.group(1), dur)
                        )
                        return
                # propagation is muted while active (so DEBUG records
                # don't flood stderr) — hand real diagnostics through to
                # the root handlers ourselves
                if rec.levelno >= logging.WARNING:
                    logging.getLogger().handle(rec)

        self._handler = _H(level=logging.DEBUG)
        for name in _WATCHED:
            lg = logging.getLogger(name)
            self._saved.append((lg, lg.level, lg.propagate))
            lg.addHandler(self._handler)
            lg.setLevel(logging.DEBUG)
            lg.propagate = False
        return self

    def stop(self) -> None:
        for lg, level, prop in self._saved:
            if self._handler is not None:
                lg.removeHandler(self._handler)
            lg.setLevel(level)
            lg.propagate = prop
        self._saved = []

    def summary(self) -> dict:
        out = {
            "cache_hits": 0,
            "cache_misses": 0,
            "trace_s": 0.0,
            "lower_s": 0.0,
            "xla_compile_s": 0.0,
            "modules": [],
        }
        for _ts, kind, name, dur in self.events:
            if kind == "cache_hit":
                out["cache_hits"] += 1
            elif kind == "cache_miss":
                out["cache_misses"] += 1
                out["modules"].append(name)
            elif kind == "trace":
                out["trace_s"] += dur or 0.0
            elif kind == "lower":
                out["lower_s"] += dur or 0.0
            elif kind == "compile":
                out["xla_compile_s"] += dur or 0.0
        out["trace_s"] = round(out["trace_s"], 3)
        out["lower_s"] = round(out["lower_s"], 3)
        out["xla_compile_s"] = round(out["xla_compile_s"], 3)
        out["modules"] = out["modules"][:8]  # bound the artifact size
        return out


def probe_backend() -> dict:
    """Compile + run a TRIVIAL jitted program end-to-end, twice.

    first_s bounds the backend's claim + program-load + dispatch floor
    (compile is ~0.4s, payload ~bytes); second_s re-runs the SAME
    compiled callable, so it measures the steady dispatch round-trip
    only (a second distinct program re-paid a full trace+compile ~0.4s
    and overstated the dispatch floor ~10x — review r5).  first_s >>
    seconds proves a backend/tunnel stall that no repo-side work can
    remove."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: x * 2 + 1)
    t0 = time.time()
    jax.device_get(fn(jnp.int32(20)))
    first = time.time() - t0
    t0 = time.time()
    jax.device_get(fn(jnp.int32(14)))
    second = time.time() - t0
    # 6-digit rounding: a cached dispatch is sub-millisecond on CPU and
    # ~1-40ms on the tunnel; 3 digits truncated it to 0.0
    return {"first_s": round(first, 3), "second_s": round(second, 6)}
