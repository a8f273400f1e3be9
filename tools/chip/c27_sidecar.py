# chip: scale serve-init with the packed sidecar — round 0 cold (writes
# sidecar), rounds 1-2 hit.  Compare vs run-2 official 29.3s.
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from pseudoaligner_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()
from pseudoaligner_tpu.serde import load_index
from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner

B, L = 65536, 60
image = load_index("/root/repo/.bench_scale_index.bin")
reads = np.load("/root/repo/.bench_scale_reads.npy")[:B].astype(np.int32)
lens = np.full(B, L, np.int32)
for rnd in range(3):
    t0 = time.time()
    al = Pseudoaligner(image, AlignerConfig(
        k=20, batch_size=B, max_read_len=L, max_nodes=6,
        distinct_cap=3, max_walk_iters=2, max_left_iters=2))
    t1 = time.time()
    r = jax.device_get(al.map_batch_device(reads, lens))
    t2 = time.time()
    print(f"[{rnd}] construct {t1-t0:.1f}s first_batch {t2-t1:.1f}s "
          f"total {t2-t0:.1f}s", flush=True)
    del al, r
