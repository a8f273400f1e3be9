# worker spool script: gz vs plain serving on the real chip (VERDICT r3
# #4 closed on CPU; this validates the stream-decompress -> native
# scanner path doesn't starve the device at chip speeds).
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner

B, L = 65536, 60
image = bench.build_or_load_index()
al = Pseudoaligner(image, AlignerConfig(
    k=20, batch_size=B, max_read_len=L, max_nodes=6, distinct_cap=3,
    max_walk_iters=2, max_left_iters=2, pool_overlap=False,
))
object.__setattr__(al.config, "pipeline_depth", 3)
gz_rps, plain_rps = bench._bench_gz(al, B * 8, "/tmp")
print(f"gz {gz_rps:.0f} reads/s vs plain {plain_rps:.0f} reads/s "
      f"(ratio {gz_rps / plain_rps:.3f})", flush=True)
