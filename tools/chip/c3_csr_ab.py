# worker spool script: csr200k vs mb48 interleaved A/B (PERF.md round 4:
# "the csr200k gap tracks TABLE SIZE, not the EC path" — both indexes
# have ~48M kmers; mb48 has few transcripts (bitset EC), csr200k has
# 200k (host-CSR EC).  Equal throughput here = attribution CONFIRMED).
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench
from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner
from pseudoaligner_tpu.serde import load_index

B, L = 65536, 60
repo = "/root/repo"
cases = {}
for name, ipath, rpath in (
    ("csr200k", f"{repo}/.bench_scale_index_csr200k.bin",
     f"{repo}/.bench_scale_reads_csr200k.npy"),
    ("mb48", f"{repo}/.bench_scale_index_mb48.bin",
     f"{repo}/.bench_scale_reads_mb48.npy"),
):
    image = load_index(ipath)
    reads = np.load(rpath)
    lens = np.full(B, L, dtype=np.int32)
    al = Pseudoaligner(image, AlignerConfig(
        k=20, batch_size=B, max_read_len=L, max_nodes=6, distinct_cap=3,
        max_walk_iters=2, max_left_iters=2, pool_overlap=False,
    ))
    batches = [(reads[i * B:(i + 1) * B].astype(np.int32), lens)
               for i in range(9)]
    bench.serve_pass(al, batches, depth=3)  # compile + warm
    cases[name] = (al, batches, image.mphf.n_keys)
    print(f"{name}: {image.mphf.n_keys} kmers warm", flush=True)

for rnd in range(3):  # interleaved: same-session deltas only (PERF rules)
    for name, (al, batches, nk) in cases.items():
        n, un, dt = bench.serve_pass(al, batches[1:], depth=3)
        print(f"[{rnd}] {name}: {n / dt:.0f} reads/s "
              f"({n} in {dt:.2f}s, unmapped {un})", flush=True)
