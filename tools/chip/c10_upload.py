# worker spool script: pin the scale-row serve_init floor — how much is
# pure H2D upload of the device tables at 27M kmers?
import glob
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

import os

sfx = {"default": ""}.get(os.environ.get("BENCH_SCALE_MODE", "default"),
                          "_" + os.environ.get("BENCH_SCALE_MODE", ""))
hits = sorted(glob.glob(
    f"/root/repo/.bench_scale_index{sfx}.bin.dev-*.npz"))
if not hits:
    print(f"no devcache for mode {sfx or 'default'} — run "
          "tools/prebuild_bench_caches.py first", flush=True)
    raise SystemExit(0)
path = hits[0]
t0 = time.time()
with np.load(path) as z:
    arrs = {k: z[k] for k in z.files}
print(f"devcache load {time.time() - t0:.1f}s "
      f"({sum(a.nbytes for a in arrs.values()) / 1e6:.0f} MB)", flush=True)
for rnd in range(2):
    t0 = time.time()
    devs = [jax.device_put(a) for a in arrs.values() if a.size]
    for d in devs:
        jax.device_get(jax.jit(lambda x: x.ravel()[0])(d))
    print(f"[{rnd}] upload+materialize {time.time() - t0:.1f}s", flush=True)
    del devs
