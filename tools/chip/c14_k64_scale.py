# worker spool script: k64 scale row with this round's serving shape
# (caps (2,2), depth 4) — r3 quoted 846k at caps (3,2).
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner
from pseudoaligner_tpu.serde import load_index

sys.argv = ["x"]
import os

os.environ["BENCH_SCALE_MODE"] = "k64"
import importlib

import bench
importlib.reload(bench)  # worker namespace may hold default-mode bench

B, L = 65536, bench.SCALE_L
image = load_index(bench.SCALE_INDEX_CACHE)
reads = np.load(bench.SCALE_READS_CACHE)
lens = np.full(B, L, dtype=np.int32)
batches = [(reads[i * B:(i + 1) * B].astype(np.int32), lens)
           for i in range(9)]
t0 = time.time()
al = Pseudoaligner(image, AlignerConfig(
    k=64, batch_size=B, max_read_len=L, max_nodes=6, distinct_cap=3,
    max_walk_iters=2, max_left_iters=2, pool_overlap=False,
))
bench.serve_pass(al, batches[:1], depth=1)
print(f"k64 serve_init {time.time() - t0:.1f}s "
      f"({image.mphf.n_keys} kmers)", flush=True)
bench.serve_pass(al, batches[1:], depth=4)
for rnd in range(3):
    n, un, dt = bench.serve_pass(al, batches[1:], depth=4)
    print(f"[{rnd}] k64: {n / dt:.0f} reads/s ({n} in {dt:.2f}s, "
          f"unmapped {un})", flush=True)
