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
_pass = bench._prep_gz(al, B * 8, "/tmp")
_runs = [_pass() for _ in range(2)]
gz_rps = max(g for g, _ in _runs)
plain_rps = max(p for _, p in _runs)
print(f"gz {gz_rps:.0f} reads/s vs plain {plain_rps:.0f} reads/s "
      f"(ratio {gz_rps / plain_rps:.3f})", flush=True)
