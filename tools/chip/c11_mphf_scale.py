# worker spool script: scale-row serve in seed_index="mphf" mode — the
# memory-lean alternative to the 537MB cuckoo tables.  Quantifies the
# serve_init (upload is LINK-bound at ~28MB/s) vs throughput tradeoff
# on the real chip, interleaved with cuckoo mode.
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench
from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner
from pseudoaligner_tpu.serde import load_index

B, L = 65536, 60
image = load_index(bench.SCALE_INDEX_CACHE)
reads = np.load(bench.SCALE_READS_CACHE)
lens = np.full(B, L, dtype=np.int32)
batches = [(reads[i * B:(i + 1) * B].astype(np.int32), lens)
           for i in range(9)]
als = {}
for mode in ("mphf", "cuckoo"):
    t0 = time.time()
    al = Pseudoaligner(image, AlignerConfig(
        k=20, batch_size=B, max_read_len=L, max_nodes=6, distinct_cap=3,
        max_walk_iters=2, max_left_iters=2, pool_overlap=False,
        seed_index=mode,
    ))
    bench.serve_pass(al, batches[:1], depth=1)
    print(f"{mode}: serve_init {time.time() - t0:.1f}s", flush=True)
    bench.serve_pass(al, batches[1:], depth=3)  # warm
    als[mode] = al
for rnd in range(3):
    for mode, al in als.items():
        n, un, dt = bench.serve_pass(al, batches[1:], depth=3)
        print(f"[{rnd}] {mode}: {n / dt:.0f} reads/s ({n} in {dt:.2f}s, "
              f"unmapped {un})", flush=True)
