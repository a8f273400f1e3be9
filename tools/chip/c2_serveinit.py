# worker spool script: scale-row serve init with the device-image disk
# cache (VERDICT r3 #8).  r3 measured 41.7s warm at 27M kmers; the
# devcache load is 2.7s on CPU — this measures load + HBM upload +
# compile on the real chip.
import os
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
t0 = time.time()
al = Pseudoaligner(image, AlignerConfig(
    k=20, batch_size=B, max_read_len=L, max_nodes=6, distinct_cap=3,
    max_walk_iters=2, max_left_iters=2, pool_overlap=False,
))
t_con = time.time() - t0
batches = [(reads[i * B:(i + 1) * B].astype(np.int32), lens)
           for i in range(9)]
t0 = time.time()
bench.serve_pass(al, batches[:1], depth=1)
t_first = time.time() - t0
print(f"serve_init: construct {t_con:.1f}s first-batch {t_first:.1f}s "
      f"total {t_con + t_first:.1f}s ({image.mphf.n_keys} kmers)", flush=True)
bench.serve_pass(al, batches[1:], depth=3)
n, _, dt = bench.serve_pass(al, batches[1:], depth=3)
print(f"scale serve: {n / dt:.0f} reads/s ({n} in {dt:.2f}s)", flush=True)
