# worker spool script: count-path phase profile (PA_TIMERS from
# construction) — completes the floor attribution across workloads
# (map: floor budget; paired: c12; scale: table size + link; count: ?).
import os
import sys
import time

os.environ["PA_TIMERS"] = "1"
sys.path.insert(0, "/root/repo")
import numpy as np

import bench
from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner
from pseudoaligner_tpu.singlecell import count_single_cell

B, L = 65536, 60
image = bench.build_or_load_index()
al = Pseudoaligner(image, AlignerConfig(
    k=20, batch_size=B, max_read_len=L, max_nodes=6, distinct_cap=3,
    max_walk_iters=2, max_left_iters=2, pool_overlap=False,
))
object.__setattr__(al.config, "pipeline_depth", 4)
n_pairs = B * 8
r1, r2 = bench.synth_count_inputs(n_pairs)
p1, p2 = "/tmp/cp_r1.fq", "/tmp/cp_r2.fq"
bench._write_synth_fastq(p1, r1)
bench._write_synth_fastq(p2, r2)

# singles floor for comparison (count maps only R2)
codes, _ = bench.synth_reads(image, B * 8)
lens0 = np.full(B, L, dtype=np.int32)
sb = [(codes[i * B:(i + 1) * B], lens0) for i in range(8)]
devnull = open(os.devnull, "wb")
count_single_cell(al, p1, p2, umi_dedup="directional")  # warm
bench.serve_pass(al, sb, depth=4, devnull=devnull)
for rnd in range(2):
    n, _, dt = bench.serve_pass(al, sb, depth=4, devnull=devnull)
    print(f"[{rnd}] singles: {n / dt:.0f} reads/s", flush=True)
    al.phase_times.clear()
    t0 = time.time()
    counts = count_single_cell(al, p1, p2, umi_dedup="directional")
    t_map = time.time() - t0
    t0 = time.time()
    counts.cell_totals("directional")
    t_tot = time.time() - t0
    print(f"[{rnd}] count: {n_pairs / (t_map + t_tot):.0f} pairs/s "
          f"(stream {t_map:.2f}s + totals/knee/fold/dedup {t_tot:.2f}s); "
          f"phases:", flush=True)
    for k, v in sorted(al.phase_times.items(), key=lambda kv: -kv[1]):
        if v > 0.01:
            print(f"    {k:24s} {v:.3f}s", flush=True)
os.environ.pop("PA_TIMERS", None)
