"""Large-transcriptome scale checks (synthetic ~20Mb, ~20k transcripts):
exercises the host CSR intersection path (bitset disabled above the
threshold) and the native builder at a size an order beyond the fixtures.
Marked `full` — a couple of minutes on CPU."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def big_transcripts():
    rng = np.random.default_rng(99)
    # gene families: base sequences with variant transcripts sharing long
    # stretches, so equivalence classes are non-trivial
    seqs = []
    names = []
    gene_map = {}
    n_genes = 2000
    for g in range(n_genes):
        base = rng.integers(0, 4, size=int(rng.integers(300, 2000))).astype(np.uint8)
        n_iso = int(rng.integers(1, 20)) if g % 50 == 0 else int(rng.integers(1, 4))
        for i in range(n_iso):
            if i == 0:
                s = base
            else:
                # isoform: splice out a random interior window
                a = int(rng.integers(0, len(base) // 2))
                b = int(rng.integers(a + 50, min(len(base), a + 500)))
                s = np.concatenate([base[:a], base[b:]])
            if len(s) < 20:
                continue
            name = f"tx{g}_{i}"
            seqs.append(s)
            names.append(name)
            gene_map[name] = f"gene{g}"
    return seqs, names, gene_map


@pytest.mark.full
def test_big_build_and_map(big_transcripts):
    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.golden import GoldenAligner
    from pseudoaligner_tpu.index.builder import build_index
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    seqs, names, gene_map = big_transcripts
    total = sum(len(s) for s in seqs)
    assert total > 2_000_000
    img = build_index(seqs, names, gene_map, k=20)
    assert img.n_kmers > 1_000_000

    # force the large-transcriptome path: no bitsets (CSR fallback) in full
    # mode, and the compact path in serving mode
    cfg = AlignerConfig(
        k=20, batch_size=512, max_read_len=64, max_nodes=64,
        bitset_tx_threshold=0, distinct_cap=16,
    )
    al = Pseudoaligner(img, cfg)
    golden = GoldenAligner(img)

    rng = np.random.default_rng(5)
    B, L = 512, 64
    codes = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    ids = []
    for i in range(B):
        tx = int(rng.integers(0, len(seqs)))
        s = seqs[tx]
        if len(s) < 60:
            s = np.concatenate([s, np.zeros(60 - len(s), np.uint8)])
        st = int(rng.integers(0, max(1, len(s) - 60)))
        codes[i, :60] = s[st : st + 60]
        lens[i] = 60
        ids.append(f"q{i}")

    from pseudoaligner_tpu.io.fastq import ReadBatch

    batch = ReadBatch(codes=codes, lens=lens, ids=ids)
    recs = al.records_from_result(al.map_batch_device(codes, lens), batch)
    n_checked = 0
    for i in range(0, B, 7):  # spot-check a seventh against the oracle
        g = golden.map_read(codes[i, : lens[i]])
        rec = recs[i]
        if g is None:
            assert rec.coverage == 0 and rec.eq_class == []
        else:
            assert rec.eq_class == g[0], ids[i]
            assert rec.coverage == g[1], ids[i]
        n_checked += 1
    assert n_checked >= 70
