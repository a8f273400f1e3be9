# worker spool script: chase the gz bimodality — (a) reader-only gz
# throughput ON this box while the worker idles the chip, (b) serving
# A/B across inflate chunk/read-ahead knobs, interleaved with plain.
import gzip
import importlib
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

from pseudoaligner_tpu.io.fastq import FastqReader

for rnd in range(2):  # (a) reader-only: is the input side ever the wall?
    t0 = time.time()
    tot = sum(b.n_reads for b in FastqReader(p + ".gz", B, L))
    print(f"[reader-only {rnd}] gz {tot / (time.time() - t0):.0f} reads/s",
          flush=True)

devnull = open(os.devnull, "wb")
al.emit_fastq(p, devnull)
al.emit_fastq(p + ".gz", devnull)
for rnd in range(3):  # (b) serving A/B over knobs
    for tag, env in (
        ("plain", None),
        ("gz c1m/a32m", {"PA_GZ_CHUNK": "1048576", "PA_GZ_AHEAD": "33554432"}),
        ("gz c4m/a64m", {"PA_GZ_CHUNK": "4194304", "PA_GZ_AHEAD": "67108864"}),
        ("gz c256k/a8m", {"PA_GZ_CHUNK": "262144", "PA_GZ_AHEAD": "8388608"}),
    ):
        path = p if env is None else p + ".gz"
        if env:
            os.environ.update(env)
        t0 = time.time()
        n, _ = al.emit_fastq(path, devnull)
        dt = time.time() - t0
        print(f"[{rnd}] {tag}: {n / dt:.0f} reads/s ({n} in {dt:.2f}s)",
              flush=True)
        for k in (env or {}):
            os.environ.pop(k, None)
