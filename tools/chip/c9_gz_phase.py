# worker spool script: where do the gz serving batches lose ~20ms vs
# plain?  Wraps _GzScanBuffer.fill (producer wait + memcpy) and the
# reader's _scan (scan+refill loop) with accumulating timers.
import gzip
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner
from pseudoaligner_tpu.io import fastq as fq

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

acc = {"fill": 0.0, "scan": 0.0, "compact": 0.0, "n_fill": 0}
_fill = fq._GzScanBuffer.fill
_compact = fq._GzScanBuffer.compact
_scan = fq.FastqReader._scan


def fill(self, n):
    t0 = time.time()
    _fill(self, n)
    acc["fill"] += time.time() - t0
    acc["n_fill"] += 1


def compact(self, off):
    t0 = time.time()
    r = _compact(self, off)
    acc["compact"] += time.time() - t0
    return r


def scan(self, max_n, L):
    t0 = time.time()
    r = _scan(self, max_n, L)
    acc["scan"] += time.time() - t0
    return r


fq._GzScanBuffer.fill = fill
fq._GzScanBuffer.compact = compact
fq.FastqReader._scan = scan

devnull = open(os.devnull, "wb")
al.emit_fastq(p, devnull)
al.emit_fastq(p + ".gz", devnull)
for rnd in range(2):
    for k in acc:
        acc[k] = 0
    t0 = time.time()
    n, _ = al.emit_fastq(p + ".gz", devnull)
    dt = time.time() - t0
    print(f"[{rnd}] gz {n / dt:.0f} reads/s; fill {acc['fill']:.3f}s "
          f"({acc['n_fill']}x) scan(incl fill) {acc['scan']:.3f}s "
          f"compact {acc['compact']:.3f}s of {dt:.3f}s", flush=True)
    for k in acc:
        acc[k] = 0
    t0 = time.time()
    n, _ = al.emit_fastq(p, devnull)
    dt = time.time() - t0
    print(f"[{rnd}] plain {n / dt:.0f} reads/s; scan {acc['scan']:.3f}s "
          f"of {dt:.3f}s", flush=True)
