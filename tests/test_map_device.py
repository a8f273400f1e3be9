"""Device mapping engine vs golden oracle — bit-exact parity on every read
of the bundled FASTQ (the reference's smoke workload, test/small.fq)."""

import numpy as np
import pytest

from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.golden import GoldenAligner
from pseudoaligner_tpu.io.fastq import ReadBatch
from pseudoaligner_tpu.models.aligner import Pseudoaligner


def _make_batches(reads, B, L):
    for i in range(0, len(reads), B):
        chunk = reads[i : i + B]
        codes = np.zeros((B, L), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        ids = []
        for j, (rid, c) in enumerate(chunk):
            codes[j, : len(c)] = c
            lens[j] = len(c)
            ids.append(rid)
        yield ReadBatch(codes=codes, lens=lens, ids=ids)


def _check_parity(image, reads, use_bitset=True, max_read_len=64,
                  allowed_mismatches=2, pool_overlap=False):
    cfg = AlignerConfig(
        k=image.k,
        batch_size=256,
        max_read_len=max_read_len,
        max_nodes=64,
        bitset_tx_threshold=1 << 20 if use_bitset else 0,
        distinct_cap=0,  # full debug outputs for node-level parity
        allowed_mismatches=allowed_mismatches,
        pool_overlap=pool_overlap,
    )
    al = Pseudoaligner(image, cfg)
    golden = GoldenAligner(image)

    n_checked = 0
    for batch in _make_batches(reads, cfg.batch_size, cfg.max_read_len):
        res = al.map_batch_device(batch.codes, batch.lens)
        recs = al.records_from_result(res, batch)
        nodes = np.asarray(res.nodes)
        n_nodes = np.asarray(res.n_nodes)
        mm = np.asarray(res.mismatches)
        for i, rid in enumerate(batch.ids):
            read = batch.codes[i, : batch.lens[i]]
            g = golden.map_read_to_nodes_with_mismatch(read, cfg.allowed_mismatches)
            rec = recs[i]
            if g is None:
                assert not rec.flag or rec.coverage == 0
                assert n_nodes[i] == 0, (rid, nodes[i])
                assert rec.eq_class == [] and rec.coverage == 0
            else:
                gcov, gmm, gnodes = g
                assert n_nodes[i] == len(gnodes), (rid, nodes[i], gnodes)
                assert nodes[i, : n_nodes[i]].tolist() == gnodes, rid
                assert rec.coverage == gcov, rid
                assert mm[i] == gmm, rid
                geq = golden.nodes_to_eq_class(gnodes)
                assert rec.eq_class == geq, rid
                gflag = gcov >= cfg.read_coverage_threshold and len(geq) == 0
                assert rec.flag == gflag, rid
            n_checked += 1
    return n_checked


def test_device_parity_small_subset(small_index, small_reads):
    n = _check_parity(small_index, small_reads[:600])
    assert n == 600


def test_device_parity_small_subset_csr_path(small_index, small_reads):
    """Same but exercising the host CSR-intersection fallback."""
    n = _check_parity(small_index, small_reads[:300], use_bitset=False)
    assert n == 300


@pytest.mark.full
def test_device_parity_full_fastq(full_index, small_reads):
    n = _check_parity(full_index, small_reads)
    assert n == len(small_reads)


def test_device_handles_short_and_padded_reads(small_index):
    cfg = AlignerConfig(k=20, batch_size=8, max_read_len=64, max_nodes=64)
    al = Pseudoaligner(small_index, cfg)
    codes = np.zeros((8, 64), dtype=np.uint8)
    lens = np.zeros(8, dtype=np.int32)
    # one real read from the index itself
    seq = small_index.node_seq(0)[:40]
    codes[0, :40] = seq
    lens[0] = 40
    # one too-short read
    codes[1, :10] = 1
    lens[1] = 10
    res = al.map_batch_device(codes, lens)
    mapped = np.asarray(res.mapped)
    assert mapped[0]
    assert not mapped[1]
    assert not mapped[2:].any()
    assert np.asarray(res.coverage)[0] == 40


def test_compact_output_parity(small_index, small_reads):
    """Compact serving outputs (distinct EC ids + host CSR materialization)
    must produce identical records to the full debug path."""
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    base = AlignerConfig(k=20, batch_size=256, max_read_len=64, max_nodes=64,
                         distinct_cap=0)
    compact = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                            max_nodes=64, distinct_cap=4)
    a1 = Pseudoaligner(small_index, base)
    a2 = Pseudoaligner(small_index, compact)
    for batch in _make_batches(small_reads[:512], 256, 64):
        r1 = a1.records_from_result(a1.map_batch_device(batch.codes, batch.lens), batch)
        r2 = a2.records_from_result(a2.map_batch_device(batch.codes, batch.lens), batch)
        for x, y in zip(r1, r2):
            assert x == y, (x, y)


def _k64_reads(small_transcripts, n=300, L=90, seed=17):
    """Transcript windows >= k=64 long, with SNP and reversed variants."""
    seqs, _, _ = small_transcripts
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        s = seqs[int(rng.integers(0, len(seqs)))]
        if len(s) < L:
            continue
        st = int(rng.integers(0, len(s) - L + 1))
        w = s[st : st + L].copy()
        kind = i % 3
        if kind == 1:  # SNP
            p = int(rng.integers(0, L))
            w[p] = (w[p] + 1 + rng.integers(0, 3)) % 4
        elif kind == 2:  # reversed negative
            w = w[::-1].copy()
        out.append((f"k64r{i}", w))
    return out


def test_device_parity_k64(small_transcripts):
    """Device engine parity at k=64 (4-word k-mers) — exercises the wide
    kmer packing, hashing, cuckoo rows, and window compares."""
    from pseudoaligner_tpu.index.builder import build_index

    seqs, names, gene_map = small_transcripts
    image = build_index(seqs, names, gene_map, k=64)
    reads = _k64_reads(small_transcripts)
    assert len(reads) > 200
    _check_parity(image, reads, max_read_len=96)


def test_device_parity_k64_mphf(small_transcripts):
    """Same at k=64 through the MPHF seed-index mode."""
    from pseudoaligner_tpu.index.builder import build_index

    seqs, names, gene_map = small_transcripts
    image = build_index(seqs, names, gene_map, k=64)
    cfg = AlignerConfig(
        k=64, batch_size=128, max_read_len=96, max_nodes=64,
        seed_index="mphf", distinct_cap=0,
    )
    al = Pseudoaligner(image, cfg)
    golden = GoldenAligner(image)
    reads = _k64_reads(small_transcripts, n=256, seed=23)
    checked = 0
    for batch in _make_batches(reads, 128, 96):
        res = al.map_batch_device(batch.codes, batch.lens)
        recs = al.records_from_result(res, batch)
        for i, rid in enumerate(batch.ids):
            read = batch.codes[i, : batch.lens[i]]
            g = golden.map_read(read)
            rec = recs[i]
            if g is None:
                assert rec.coverage == 0 and rec.eq_class == []
            else:
                assert rec.eq_class == g[0] and rec.coverage == g[1], rid
            checked += 1
    assert checked == len(reads)


def test_walk_iteration_cap_parity(small_index, small_reads):
    """An aggressively capped walk (max_walk_iters=2) must still produce
    records identical to the uncapped engine — capped lanes go through the
    exact device fallback pass."""
    uncapped = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                             max_nodes=64, distinct_cap=8, max_walk_iters=0,
                             max_left_iters=0)
    capped = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                           max_nodes=64, distinct_cap=8, max_walk_iters=2)
    a1 = Pseudoaligner(small_index, uncapped)
    a2 = Pseudoaligner(small_index, capped)
    n = 0
    for batch in _make_batches(small_reads[:512], 256, 64):
        r1 = a1.records_from_result(
            a1.map_batch_device(batch.codes, batch.lens), batch)
        r2 = a2.records_from_result(
            a2.map_batch_device(batch.codes, batch.lens), batch)
        for x, y in zip(r1, r2):
            assert x == y, (x, y)
            n += 1
    assert n == 512


def test_left_extension_cap_parity(small_index, small_reads):
    """An aggressively capped left extension (max_left_iters=1) must still
    produce records identical to the uncapped engine — lanes whose left
    chain is cut carry the -3 marker and re-run on the exact fallback."""
    uncapped = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                             max_nodes=64, distinct_cap=8, max_walk_iters=0,
                             max_left_iters=0)
    capped = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                           max_nodes=64, distinct_cap=8, max_walk_iters=0,
                           max_left_iters=1)
    a1 = Pseudoaligner(small_index, uncapped)
    a2 = Pseudoaligner(small_index, capped)
    n = 0
    for batch in _make_batches(small_reads[:512], 256, 64):
        r1 = a1.records_from_result(
            a1.map_batch_device(batch.codes, batch.lens), batch)
        r2 = a2.records_from_result(
            a2.map_batch_device(batch.codes, batch.lens), batch)
        for x, y in zip(r1, r2):
            assert x == y, (x, y)
            n += 1
    assert n == 512


def test_lane_compaction_parity(small_index, small_reads):
    """Two-tier lane compaction (left loop on a compacted buffer, forward
    walk split at walk_split with a compacted tail) must produce records
    identical to the uncapped engine — including when the compact buffers
    overflow (overflow lanes take the deterministic -3 exact fallback)."""
    uncapped = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                             max_nodes=64, distinct_cap=8, max_walk_iters=0,
                             max_left_iters=0)
    a1 = Pseudoaligner(small_index, uncapped)
    for lc, ws, wc in [(0.25, 2, 0.5), (0.02, 1, 0.02)]:  # roomy, overflow
        tiered = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                               max_nodes=64, distinct_cap=8,
                               max_walk_iters=6, max_left_iters=2,
                               left_compact=lc, walk_split=ws,
                               walk_compact=wc)
        a2 = Pseudoaligner(small_index, tiered)
        n = 0
        for batch in _make_batches(small_reads[:512], 256, 64):
            r1 = a1.records_from_result(
                a1.map_batch_device(batch.codes, batch.lens), batch)
            r2 = a2.records_from_result(
                a2.map_batch_device(batch.codes, batch.lens), batch)
            for x, y in zip(r1, r2):
                assert x == y, (lc, ws, wc, x, y)
                n += 1
        assert n == 512


def test_walk_unroll_parity(small_index, small_reads):
    """walk_unroll executes multiple masked steps per while_loop iteration;
    records must be identical to the unroll=1 engine."""
    base = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                         max_nodes=64, distinct_cap=8, max_walk_iters=4,
                         max_left_iters=2)
    unrolled = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                             max_nodes=64, distinct_cap=8, max_walk_iters=4,
                             max_left_iters=2, walk_unroll=3)
    a1 = Pseudoaligner(small_index, base)
    a2 = Pseudoaligner(small_index, unrolled)
    n = 0
    for batch in _make_batches(small_reads[:512], 256, 64):
        r1 = a1.records_from_result(
            a1.map_batch_device(batch.codes, batch.lens), batch)
        r2 = a2.records_from_result(
            a2.map_batch_device(batch.codes, batch.lens), batch)
        for x, y in zip(r1, r2):
            assert x == y, (x, y)
            n += 1
    assert n == 512


def test_all_ones_kmer_k64(small_transcripts):
    """At word-filling k (2k == 32W) the all-ones key pattern (poly-T) is
    a REAL k-mer that collides with the keys-only table's empty-slot
    marker — its payload relocates to meta.ones_node/ones_off and the
    probe resolves it with a dense compare.  Map poly-T reads through an
    index that contains a long T run and check golden parity."""
    from pseudoaligner_tpu.index.builder import build_index

    seqs, names, gene_map = small_transcripts
    seqs = list(seqs[:20])
    names = list(names[:20]) + ["POLYT_TX"]
    gene_map = {n: gene_map.get(n, n) for n in names}
    rng = np.random.default_rng(5)
    polyt = np.full(120, 3, dtype=np.uint8)  # 120 T's
    polyt[:20] = rng.integers(0, 4, 20)  # unique-ish prefix
    seqs.append(polyt)
    image = build_index(seqs, names, gene_map, k=64)

    cfg = AlignerConfig(k=64, batch_size=64, max_read_len=96, max_nodes=64,
                        distinct_cap=0, bitset_tx_threshold=1 << 20)
    al = Pseudoaligner(image, cfg)
    assert al.meta.ones_node >= 0  # the poly-T 64-mer really relocated
    golden = GoldenAligner(image)
    reads = [
        ("polyT", np.full(80, 3, dtype=np.uint8)),          # pure poly-T
        ("mix", np.asarray(seqs[-1][10:90], dtype=np.uint8)),  # crosses in
        ("ctrl", np.asarray(seqs[0][:80], dtype=np.uint8)),
    ]
    for batch in _make_batches(reads, 64, 96):
        res = al.map_batch_device(batch.codes, batch.lens)
        recs = al.records_from_result(res, batch)
        for i, rid in enumerate(batch.ids):
            if not rid:
                continue
            read = batch.codes[i, : batch.lens[i]]
            g = golden.map_read(read)
            rec = recs[i]
            if g is None:
                assert rec.coverage == 0 and rec.eq_class == [], rid
            else:
                assert rec.eq_class == g[0] and rec.coverage == g[1], rid


def test_two_tier_seed_parity(small_index, small_reads):
    """Two-tier seed probing (seed_compact) must produce records identical
    to the dense engine — including when the miss-at-0 compact buffer
    overflows (over-capacity lanes take the deterministic -3 exact
    fallback) and in combination with walk caps + lane compaction."""
    dense = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                          max_nodes=64, distinct_cap=8, max_walk_iters=0,
                          max_left_iters=0)
    a1 = Pseudoaligner(small_index, dense)
    for sc in (0.75, 0.02):  # roomy, then forced overflow
        tiered = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                               max_nodes=12, distinct_cap=8,
                               max_walk_iters=6, max_left_iters=2,
                               seed_compact=sc)
        a2 = Pseudoaligner(small_index, tiered)
        n = 0
        for batch in _make_batches(small_reads[:512], 256, 64):
            r1 = a1.records_from_result(
                a1.map_batch_device(batch.codes, batch.lens), batch)
            r2 = a2.records_from_result(
                a2.map_batch_device(batch.codes, batch.lens), batch)
            for x, y in zip(r1, r2):
                assert x == y, (sc, x, y)
                n += 1
        assert n == 512


def test_pool_overlap_parity(small_index, small_reads):
    """Overlapping pool rows (single-row window fetch) must be
    record-identical to the legacy 2-row layout."""
    base = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                         max_nodes=9, distinct_cap=3, max_walk_iters=4,
                         max_left_iters=2)
    over = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                         max_nodes=9, distinct_cap=3, max_walk_iters=4,
                         max_left_iters=2, pool_overlap=True)
    a1 = Pseudoaligner(small_index, base)
    a2 = Pseudoaligner(small_index, over)
    assert a2.meta.pool_stride == 128 - 16 * (a2.meta.cmp_words + 1)
    n = 0
    for batch in _make_batches(small_reads[:512], 256, 64):
        r1 = a1.records_from_result(
            a1.map_batch_device(batch.codes, batch.lens), batch)
        r2 = a2.records_from_result(
            a2.map_batch_device(batch.codes, batch.lens), batch)
        for x, y in zip(r1, r2):
            assert x == y, (x, y)
            n += 1
    assert n == 512
