"""Multi-chip scaling-efficiency harness (BASELINE target: >=80% reads/s
efficiency from 1 chip to N>=2).

This round's hardware exposes a single TPU chip, so real-ICI numbers are
pending; the harness is ready to run on a pod slice as-is, and on CPU it
validates the mechanics with virtual devices (compute scaling on virtual
CPU devices is NOT a performance signal — host cores are shared).

Usage:
    python tools/scaling_bench.py [--devices 1 2 4 8] [--mode dp|kpart]

Measures pipelined batch throughput of the sharded mapping step (index
replicated, reads sharded, TCC counts psum-reduced) at each mesh size and
reports efficiency vs the single-device baseline.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--mode", choices=["dp", "kpart"], default="dp")
    ap.add_argument("--batch-per-device", type=int, default=8192)
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    import jax

    import bench as benchmod
    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.parallel.mesh import ShardedAligner, make_mesh
    from pseudoaligner_tpu.parallel.sharded_index import KmerPartitionedAligner

    n_avail = len(jax.devices())
    sizes = args.devices or [d for d in (1, 2, 4, 8) if d <= n_avail]
    image = benchmod.build_or_load_index()

    results = {}
    for nd in sizes:
        B = args.batch_per_device * nd
        # the serving shape (compact outputs + caps) for dp; the kpart
        # engine accepts the same shape (caps + -3 channel pass through)
        cfg = AlignerConfig(k=20, batch_size=B, max_read_len=60,
                            max_nodes=9, distinct_cap=3,
                            max_walk_iters=3, max_left_iters=2)
        mesh = make_mesh(nd)
        eng = (
            ShardedAligner(image, cfg, mesh)
            if args.mode == "dp"
            else KmerPartitionedAligner(image, cfg, mesh)
        )
        reads, lens = benchmod.synth_reads(image, B * (args.batches + 1))
        bs = [
            (reads[i * B : (i + 1) * B], lens[i * B : (i + 1) * B])
            for i in range(args.batches + 1)
        ]
        out = eng.map_batch(*bs[0])
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [eng.map_batch(c, l) for c, l in bs[1:]]
        got = jax.device_get(outs)
        dt = time.time() - t0
        rps = B * args.batches / dt
        results[nd] = rps
        eff = rps / (results[sizes[0]] * nd / sizes[0]) if nd != sizes[0] else 1.0
        print(f"devices={nd}: {rps:,.0f} reads/s  efficiency={eff:.1%}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
