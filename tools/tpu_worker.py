"""Persistent TPU worker: claim the chip once, execute scripts on demand.

The tunneled TPU in this environment has multi-minute claim latency, so
short-lived processes are impractical.  This worker initializes JAX/TPU
once, then polls a spool directory for python scripts, executing each in a
persistent namespace (so indexes / compiled functions are reused across
scripts) and writing <script>.out next to it.

Usage:
    python tools/tpu_worker.py /tmp/tpu_spool &
    cp myscript.py /tmp/tpu_spool/            # .out appears when done
"""

import io
import os
import sys
import time
import traceback

SPOOL = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_spool"
IDLE_TIMEOUT_S = float(os.environ.get("TPU_WORKER_IDLE_TIMEOUT", 1800))
os.makedirs(SPOOL, exist_ok=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# share the persistent XLA compilation cache with bench/CLI runs (must go
# through jax.config — the env var is snapshotted too early on this image)
from pseudoaligner_tpu.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

t0 = time.time()
import jax  # noqa: E402

devs = jax.devices()
print(f"[worker] devices={devs} init={time.time() - t0:.1f}s", flush=True)

namespace: dict = {"jax": jax}

done_marker = os.path.join(SPOOL, "_ready")
open(done_marker, "w").write(str(devs))

last_work = time.time()
while True:
    # auto-release the (single-tenant) chip if idle: a forgotten worker
    # must never block another claimant
    if time.time() - last_work > IDLE_TIMEOUT_S:
        print("[worker] idle timeout — releasing TPU", flush=True)
        break
    scripts = sorted(
        f for f in os.listdir(SPOOL)
        if f.endswith(".py") and not os.path.exists(os.path.join(SPOOL, f + ".out"))
    )
    if scripts:
        last_work = time.time()
    for name in scripts:
        path = os.path.join(SPOOL, name)
        outpath = path + ".out"
        buf = io.StringIO()
        t = time.time()
        try:
            code = open(path).read()
            old = sys.stdout
            sys.stdout = buf
            try:
                exec(compile(code, path, "exec"), namespace)
            finally:
                sys.stdout = old
            buf.write(f"\n[worker] ok in {time.time() - t:.2f}s\n")
        except SystemExit:
            raise
        except BaseException:
            buf.write("\n" + traceback.format_exc())
            buf.write(f"\n[worker] FAILED in {time.time() - t:.2f}s\n")
        with open(outpath, "w") as f:
            f.write(buf.getvalue())
        print(f"[worker] ran {name}", flush=True)
        # idle clock restarts at COMPLETION: a script that blocks for
        # hours (tunnel outage) must not trip the idle release before
        # later-queued scripts get their turn (round-4 incident)
        last_work = time.time()
    if os.path.exists(os.path.join(SPOOL, "_quit")):
        print("[worker] quit", flush=True)
        break
    time.sleep(0.5)
