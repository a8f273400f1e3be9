# worker spool script: is the gz serving jitter GIL-handoff latency?
# A/B sys.setswitchinterval over interleaved plain/gz passes.
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
al.emit_fastq(p, devnull)
al.emit_fastq(p + ".gz", devnull)
base = sys.getswitchinterval()
for rnd in range(3):
    for tag, si in (("plain", None), ("gz si=5ms", base),
                    ("gz si=0.5ms", 0.0005), ("gz si=0.1ms", 0.0001)):
        path = p if si is None else p + ".gz"
        if si is not None:
            sys.setswitchinterval(si)
        t0 = time.time()
        n, _ = al.emit_fastq(path, devnull)
        dt = time.time() - t0
        sys.setswitchinterval(base)
        print(f"[{rnd}] {tag}: {n / dt:.0f} reads/s ({n} in {dt:.2f}s)",
              flush=True)
