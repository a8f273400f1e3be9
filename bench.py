"""Benchmark: read-mapping throughput (reads/sec) on the real device.

Workload: the bundled transcriptome (test/gencode_small.fa, k=20) — the
reference's own smoke configuration (BASELINE.md) — with a large
deterministic synthetic read set (exact 60-mers + 1-SNP variants +
reversed negatives, mirroring how test/small.fq was generated) so the
chip reaches steady state.

The reference publishes no benchmark numbers (BASELINE.md).  For
`vs_baseline` we use a fixed nominal 100,000 reads/s — a generous estimate
of the multithreaded reference on a server CPU (kallisto-class throughput,
README.md:3 aspiration) — so the ratio is comparable across rounds.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compilation cache: the mapping kernel's first compile costs
# minutes on this backend; cached artifacts make repeat bench runs start in
# seconds (must be set before the first jax backend use)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np

BASELINE_READS_PER_SEC = 100_000.0
REF_FASTA = "/root/reference/test/gencode_small.fa"
INDEX_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_index_k20.bin")


def build_or_load_index():
    from pseudoaligner_tpu.serde import load_index, save_index

    if os.path.exists(INDEX_CACHE):
        try:
            return load_index(INDEX_CACHE)
        except Exception:
            pass
    from pseudoaligner_tpu.index.builder import build_index
    from pseudoaligner_tpu.io.fasta import read_transcripts

    seqs, names, gene_map = read_transcripts(REF_FASTA)
    image = build_index(seqs, names, gene_map, k=20)
    save_index(image, INDEX_CACHE)
    return image


_SEQ_CACHE = {}


def _transcript_pool(read_len):
    """Concatenated transcript windows source: every window lies within a
    single transcript, as in the bundled small.fq recipe."""
    if read_len not in _SEQ_CACHE:
        from pseudoaligner_tpu.io.fasta import read_transcripts

        seqs, _, _ = read_transcripts(REF_FASTA)
        starts = []
        base = 0
        chunks = []
        for s in seqs:
            if len(s) >= read_len:
                starts.append((base, len(s) - read_len + 1))
            chunks.append(s)
            base += len(s)
        _SEQ_CACHE[read_len] = (np.concatenate(chunks), starts)
    return _SEQ_CACHE[read_len]


def synth_reads(image, n_reads, read_len=60, seed=0):
    """Deterministic reads: 1/3 exact transcript windows, 1/3 one-SNP,
    1/3 reversed (negative controls) — the bundled small.fq recipe at
    scale (each window lies within one transcript)."""
    rng = np.random.default_rng(seed)
    flat, startable = _transcript_pool(read_len)
    # choose (transcript, offset) pairs weighted by windows available
    bases = np.array([b for b, _ in startable], dtype=np.int64)
    counts = np.array([c for _, c in startable], dtype=np.int64)
    cum = np.cumsum(counts)
    pick = rng.integers(0, cum[-1], size=n_reads)
    tx = np.searchsorted(cum, pick, side="right")
    off = pick - (cum[tx] - counts[tx])
    starts = bases[tx] + off
    idx = starts[:, None] + np.arange(read_len)[None, :]
    reads = flat[idx].astype(np.int32)
    third = n_reads // 3
    # SNPs in the middle third
    pos = rng.integers(0, read_len, size=third)
    rows = np.arange(third, 2 * third)
    reads[rows, pos] = (reads[rows, pos] + rng.integers(1, 4, size=third)) % 4
    # reverse (not complement) the last third
    reads[2 * third :] = reads[2 * third :, ::-1]
    lens = np.full(n_reads, read_len, dtype=np.int32)
    return reads, lens


def _fail(msg: str) -> int:
    """One machine-readable line + rc=1 — never a traceback wall."""
    print(json.dumps({
        "metric": "map_throughput", "value": 0, "unit": "reads/s",
        "vs_baseline": 0.0, "error": msg,
        "retry": "re-run when the TPU tunnel returns (check a plain "
                 "`python -c 'import jax; jax.devices()'` first); free "
                 "any worker holding the chip (touch /tmp/tpu_spool/_quit)",
    }))
    return 1


def _init_backend(timeout_s: float):
    """Bounded jax backend init.  A tunneled-TPU claim can block
    indefinitely when the tunnel is down or another tenant holds the
    chip (observed round 1: >9.5min with zero output) — probe in a
    daemon thread so a dead backend becomes a clear error, not a hang."""
    import threading

    res: dict = {}

    def probe():
        try:
            import jax

            res["devices"] = jax.devices()
        except Exception as e:
            res["error"] = f"backend init failed: {e!r}"

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        return (f"backend init did not return within {timeout_s:.0f}s "
                "(TPU tunnel down, or the single-tenant chip is claimed)")
    return res.get("error")


def main():
    t_setup = time.time()
    err = _init_backend(float(os.environ.get("BENCH_INIT_TIMEOUT", 900)))
    if err:
        return _fail(err)
    import jax

    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    image = build_or_load_index()

    B = int(os.environ.get("BENCH_BATCH", 65536))
    L = 60
    n_batches = int(os.environ.get("BENCH_BATCHES", 16))
    if "BENCH_WALK_CAP" in os.environ:
        caps = [(int(os.environ["BENCH_WALK_CAP"]),
                 int(os.environ.get("BENCH_LEFT_CAP", 2)), False)]
    else:
        # self-tune (walk cap, left cap, pool_overlap): tunnel conditions
        # and the host-remap overlap shift the cap optimum run to run;
        # pool_overlap (single-row window fetch, bit-exact, CPU-validated)
        # proves itself on the real chip here — a candidate that fails to
        # compile/run is skipped below
        # (6,2) never won a session sweep; dropping it keeps the compile
        # budget flat after adding the pool_overlap candidate
        caps = [(3, 2, False), (4, 2, False), (3, 2, True)]
    # serving shape: compact EC output at distinct_cap=3 (down-transfer is
    # on the critical path of the serialized tunnel; >3-class reads take
    # the overlapped host remap), node buffer sized to the push bound
    # wcap + lcap (one push per capped iteration) plus 2 slack — lanes
    # that outgrow it are -3-flagged exactly (kernel guard) — PERF.md
    aligners = [
        Pseudoaligner(image, AlignerConfig(
            k=20, batch_size=B, max_read_len=L,
            max_nodes=wcap + lcap + 2, distinct_cap=3,
            max_walk_iters=wcap, max_left_iters=lcap, pool_overlap=po,
        ))
        for wcap, lcap, po in caps
    ]
    aligner = aligners[0]

    reads, lens = synth_reads(image, B * (n_batches + 1))
    batches = [
        (reads[i * B : (i + 1) * B], lens[i * B : (i + 1) * B])
        for i in range(n_batches + 1)
    ]

    from pseudoaligner_tpu.io.fastq import ReadBatch

    def make_rb(codes, ls):
        # raw-bytes id form (empty ids): the serving fast path the
        # FastqReader produces — emit consumes the concat directly
        return ReadBatch(codes=codes, lens=ls, ids_concat=b"",
                         id_offs=np.zeros(codes.shape[0] + 1, np.int64))

    # warmup / compile (includes first host record materialization)
    rb0 = make_rb(*batches[0])
    r0 = jax.device_get(aligner.map_batch_device(batches[0][0], batches[0][1]))
    aligner.records_from_result(r0, rb0)

    # pipelined end-to-end: dispatch batch k+1, then emit batch k's records
    # natively while the device works (the emit_fastq serving pattern)
    devnull = open(os.devnull, "wb")

    try:
        from pseudoaligner_tpu.io import native  # noqa: F401

        has_native = True
    except Exception:
        has_native = False

    from pseudoaligner_tpu.pipeline import DepthPipeline

    def timed_pass(depth=None):
        # depth-D pipeline (pipeline.py): both the compact-output fetch
        # (emit_prepare, waits on map(k)) and the overflow re-map wait
        # (emit_finish, waits on remap(k) behind map(k+1)) are deferred
        # `depth` batches, so the FIFO tunnel queue stays full
        t0 = time.time()
        n_done = 0
        n_unmapped = 0
        if depth is None:
            depth = getattr(aligner.config, "pipeline_depth", 1)

        def finish(st_n):
            nonlocal n_done, n_unmapped
            st, n = st_n
            data = aligner.emit_finish(st)
            devnull.write(data)
            n_done += n
            n_unmapped += data.count(b", [], ")

        def prepare(item, _nxt):
            res, rb = item
            if has_native:
                return (aligner.emit_prepare(res, rb), rb.n_reads)
            pipe.drain_prepared()
            recs = aligner.records_from_result(jax.device_get(res), rb)
            nonlocal n_done, n_unmapped
            n_done += len(recs)
            n_unmapped += sum(1 for r in recs if not r.eq_class)
            return None

        pipe = DepthPipeline(depth, prepare, finish)
        for codes, ls in batches[1:]:
            fut = aligner.map_batch_device(codes, ls)
            pipe.push((fut, make_rb(codes, ls)))
        pipe.close()
        return n_done, n_unmapped, time.time() - t0

    # one untimed warm pass per candidate config (compiles the programs and
    # fills the signature caches — the first pass measured ~1.5-2x steady
    # state), then one scored pass each to pick the walk cap for TODAY's
    # tunnel conditions, then best-of-N timed passes with the winner:
    # dispatch latency is noisy run-to-run and min-dt is the steadier read
    if len(aligners) > 1:
        scores = []
        for al in aligners:
            aligner = al
            try:
                timed_pass()  # warm/compile
                _, _, dt_i = timed_pass()
            except Exception as e:  # candidate failed (e.g. a backend
                # compile issue for an experimental layout): skip it
                sys.stderr.write(f"bench: candidate failed, skipping: {e}\n")
                dt_i = float("inf")
            scores.append(dt_i)
        best_i = scores.index(min(scores))
        aligner = aligners[best_i]
        sys.stderr.write(
            f"bench: walk-cap self-tune {list(zip(caps, [f'{s:.2f}s' for s in scores]))}"
            f" -> cap {caps[best_i]}\n"
        )
    else:
        timed_pass()
    # depth self-tune: in-flight depth is host-side (no recompile), and
    # its optimum tracks the tunnel's latency/bandwidth mix of the day
    # (degraded-latency sessions favor 4+, healthy ones are flat >= 2)
    d_cands = (2, 3, 4)
    d_scores = [timed_pass(depth=d)[2] for d in d_cands]
    best_depth = d_cands[d_scores.index(min(d_scores))]
    sys.stderr.write(
        f"bench: depth self-tune {list(zip(d_cands, [f'{s:.2f}s' for s in d_scores]))}"
        f" -> depth {best_depth}\n"
    )
    setup_s = time.time() - t_setup
    n_passes = int(os.environ.get("BENCH_PASSES", 3))
    dts = []
    for _ in range(n_passes):
        n_done, n_unmapped, dt_i = timed_pass(depth=best_depth)
        dts.append(dt_i)
    dt = min(dts)
    n_mapped = n_done - n_unmapped

    rps = n_done / dt
    sys.stderr.write(
        f"bench: {n_done} reads end-to-end in {dt:.3f}s (passes "
        f"{'/'.join(f'{x:.2f}' for x in dts)}) on {jax.devices()[0]} "
        f"({n_mapped / n_done:.1%} mapped, setup {setup_s:.1f}s)\n"
    )
    print(
        json.dumps(
            {
                "metric": "map_throughput",
                "value": round(rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    try:
        rc = main()
    except Exception as e:  # any setup/runtime failure -> one JSON line
        rc = _fail(f"{type(e).__name__}: {e}")
    sys.exit(rc)
