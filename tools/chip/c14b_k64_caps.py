# worker spool script: k64 caps A/B — (2,2) vs (3,2), interleaved.
# L=96 reads span more nodes; the tighter walk cap may overflow far
# more lanes at k64 than at k20.
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner
from pseudoaligner_tpu.serde import load_index

os.environ["BENCH_SCALE_MODE"] = "k64"
import importlib

import bench
importlib.reload(bench)

B, L = 65536, bench.SCALE_L
image = load_index(bench.SCALE_INDEX_CACHE)
reads = np.load(bench.SCALE_READS_CACHE)
lens = np.full(B, L, dtype=np.int32)
batches = [(reads[i * B:(i + 1) * B].astype(np.int32), lens)
           for i in range(9)]
als = {}
for caps in ((2, 2), (3, 2), (4, 2)):
    w, l = caps
    al = Pseudoaligner(image, AlignerConfig(
        k=64, batch_size=B, max_read_len=L, max_nodes=w + l + 2,
        distinct_cap=3, max_walk_iters=w, max_left_iters=l,
        pool_overlap=False,
    ))
    bench.serve_pass(al, batches, depth=4)  # compile+warm
    als[caps] = al
    print(f"caps {caps} warm", flush=True)
for rnd in range(3):
    for caps, al in als.items():
        n, un, dt = bench.serve_pass(al, batches[1:], depth=4)
        print(f"[{rnd}] k64 caps={caps}: {n / dt:.0f} reads/s "
              f"({dt:.2f}s)", flush=True)
