# worker spool script: gz vs plain serving, interleaved rounds (the
# single-shot _bench_gz pair is too weather-exposed to trust — PERF
# ground rules: same-session interleaved deltas only).
import gzip
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
codes, _lens = bench.synth_reads(image, B * 8)
p = "/tmp/ab_gz.fq"
bench._write_synth_fastq(p, codes)
with open(p, "rb") as f, gzip.open(p + ".gz", "wb", compresslevel=1) as g:
    g.write(f.read())
devnull = open(os.devnull, "wb")
al.emit_fastq(p, devnull)        # compile/warm
al.emit_fastq(p + ".gz", devnull)
for rnd in range(3):
    for path, tag in ((p, "plain"), (p + ".gz", "gz")):
        t0 = time.time()
        n, _ = al.emit_fastq(path, devnull)
        dt = time.time() - t0
        print(f"[{rnd}] {tag}: {n / dt:.0f} reads/s ({n} in {dt:.2f}s)",
              flush=True)
