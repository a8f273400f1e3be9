"""Prebuild every disk cache bench.py needs, on CPU (no chip claim).

The bench caches (bundled index, synth reads, scale indexes, device-image
.npz derivations) are host-side pure functions; building them in a CPU
process keeps the single-tenant TPU session pure measurement.  Run:

    python tools/prebuild_bench_caches.py            # all modes
    BENCH_SCALE_MODE=csr200k python tools/prebuild_bench_caches.py scale

Modes (args, default all): bundled, scale, mb48.
"""

import os
import sys
import time

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from pseudoaligner_tpu.config import AlignerConfig  # noqa: E402
from pseudoaligner_tpu.models.aligner import Pseudoaligner  # noqa: E402
from pseudoaligner_tpu.serde import load_index, save_index  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", 65536))
L = 60


def _devcache(image, read_len, k=20):
    """Construct the serving aligner(s) once so device_index_from_image
    writes its .dev-<key>.npz next to the index (both pool_overlap
    variants: the bench's candidate sweep uses both strides)."""
    for po in (False, True):
        t = time.time()
        Pseudoaligner(image, AlignerConfig(
            k=k, batch_size=1024, max_read_len=read_len,
            max_nodes=6, distinct_cap=3,
            max_walk_iters=2, max_left_iters=2, pool_overlap=po,
        ))
        print(f"  devcache po={po}: {time.time() - t:.1f}s", flush=True)


def do_bundled():
    t = time.time()
    image = bench.build_or_load_index()
    print(f"bundled index: {time.time() - t:.1f}s", flush=True)
    n_batches = int(os.environ.get("BENCH_BATCHES", 16))
    t = time.time()
    bench.synth_reads(image, B * (n_batches + 1))
    print(f"bundled reads {B * (n_batches + 1)}: {time.time() - t:.1f}s",
          flush=True)
    _devcache(load_index(bench.INDEX_CACHE), L)


def do_scale():
    n_batches = int(os.environ.get("BENCH_SCALE_BATCHES", 8))
    t = time.time()
    image, _reads = bench.build_or_load_scale(
        B * (n_batches + 1), read_len=bench.SCALE_L)
    print(f"scale[{bench.SCALE_MODE}] index ({image.mphf.n_keys} kmers): "
          f"{time.time() - t:.1f}s", flush=True)
    _devcache(load_index(bench.SCALE_INDEX_CACHE), bench.SCALE_L,
              k=bench.SCALE_K)


def do_mb48():
    """48MB default-mode A/B twin of the csr200k index (same kmer count,
    few transcripts): isolates table size from the EC path (PERF.md)."""
    path = os.path.join(os.path.dirname(bench.SCALE_INDEX_CACHE),
                        ".bench_scale_index_mb48.bin")
    rpath = path.replace("index", "reads").replace(".bin", ".npy")
    if not (os.path.exists(path) and os.path.exists(rpath)):
        from pseudoaligner_tpu.index.builder import build_index

        t = time.time()
        seqs, names, gene_map = bench._scale_seqs(48_000_000)
        image = build_index(seqs, names, gene_map, k=20)
        save_index(image, path)
        print(f"mb48 index ({image.mphf.n_keys} kmers): "
              f"{time.time() - t:.1f}s", flush=True)
        # matching read set (same recipe as the scale rows) so the
        # csr200k-vs-mb48 chip A/B maps comparable workloads
        flat = np.concatenate(seqs)
        startable = []
        base = 0
        for s in seqs:
            if len(s) >= L:
                startable.append((base, len(s) - L + 1))
            base += len(s)
        n_batches = int(os.environ.get("BENCH_SCALE_BATCHES", 8))
        reads, _ = bench._recipe_from_pool(
            flat, startable, B * (n_batches + 1), L, seed=3)
        np.save(rpath, reads.astype(np.uint8))
    _devcache(load_index(path), L)


if __name__ == "__main__":
    want = sys.argv[1:] or ["bundled", "scale", "mb48"]
    for w in want:
        {"bundled": do_bundled, "scale": do_scale, "mb48": do_mb48}[w]()
    print("prebuild done", flush=True)
