# worker spool script: paired phase profile (PA_TIMERS set BEFORE
# construction) — attributes the paired gap to its map/2 floor.
import os
import sys
import time

os.environ["PA_TIMERS"] = "1"
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
object.__setattr__(al.config, "pipeline_depth", 4)
n_pairs = (B // 2) * 8
r1, r2 = bench.synth_pairs(n_pairs)
p1, p2 = "/tmp/ph_r1.fq", "/tmp/ph_r2.fq"
bench._write_synth_fastq(p1, r1)
bench._write_synth_fastq(p2, r2)
devnull = open(os.devnull, "wb")
al.emit_fastq_paired(p1, p2, devnull)  # warm/compile

# singles floor on the same aligner for the map/2 comparison
codes, _ = bench.synth_reads(image, B * 8)
lens0 = __import__("numpy").full(B, L, dtype="int32")
sb = [(codes[i * B:(i + 1) * B], lens0) for i in range(8)]
bench.serve_pass(al, sb, depth=4, devnull=devnull)
for rnd in range(2):
    n, _, dt = bench.serve_pass(al, sb, depth=4, devnull=devnull)
    print(f"[{rnd}] singles: {n / dt:.0f} reads/s", flush=True)
    al.phase_times.clear()
    t0 = time.time()
    np_ = al.emit_fastq_paired(p1, p2, devnull)
    dt = time.time() - t0
    print(f"[{rnd}] paired: {np_ / dt:.0f} pairs/s ({dt:.2f}s); phases:",
          flush=True)
    for k, v in sorted(al.phase_times.items(), key=lambda kv: -kv[1]):
        if v > 0.005:
            print(f"    {k:24s} {v:.3f}s", flush=True)

os.environ.pop("PA_TIMERS", None)
