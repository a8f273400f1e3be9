# chip: packed upload at the csr200k (~48M kmers, CSR EC path) index —
# construct + serve-init + two batches + a throughput taste.
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from pseudoaligner_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()
from pseudoaligner_tpu.serde import load_index
from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner
import bench

B, L = 65536, 60
image = load_index("/root/repo/.bench_scale_index_csr200k.bin")
print(f"csr200k: {image.mphf.n_keys} kmers, {image.n_nodes} nodes,"
      f" {image.n_tx} tx", flush=True)
rng = np.random.default_rng(3)
reads = rng.integers(0, 4, size=(B, L), dtype=np.int32)
lens = np.full(B, L, np.int32)
for rnd in range(2):
    t0 = time.time()
    al = Pseudoaligner(image, AlignerConfig(
        k=20, batch_size=B, max_read_len=L, max_nodes=6,
        distinct_cap=3, max_walk_iters=2, max_left_iters=2))
    t1 = time.time()
    r = jax.device_get(al.map_batch_device(reads, lens))
    t2 = time.time()
    batches = [(reads, lens)] * 8
    bench.serve_pass(al, batches[:1], depth=1)
    n, _, dt = bench.serve_pass(al, batches, depth=4)
    print(f"[{rnd}] construct {t1-t0:.1f}s first_batch {t2-t1:.1f}s "
          f"serve {n/dt/1e3:.0f}k r/s", flush=True)
    del al, r
