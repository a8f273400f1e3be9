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
def test_big_build_and_map_k64(big_transcripts):
    """k=64 at scale (the reference validates BOTH k=20 and k=64 builds,
    src/build_index.rs:394-421): build the ~3.5Mb family set at k=64,
    sampled validate_dbg (kmer -> MPHF slot -> stored key + EC membership),
    and device-vs-golden map parity on transcript windows."""
    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.dna import pack_kmers
    from pseudoaligner_tpu.golden import GoldenAligner
    from pseudoaligner_tpu.index.builder import build_index
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    seqs, names, gene_map = big_transcripts
    img = build_index(seqs, names, gene_map, k=64)
    assert img.n_kmers > 1_000_000

    rng = np.random.default_rng(7)
    # sampled per-kmer check: slot stores the queried key, its node spells
    # it back, and the EC contains the source transcript
    n_samp = 400
    kws, srcs = [], []
    for _ in range(n_samp):
        tx = int(rng.integers(0, len(seqs)))
        s = seqs[tx]
        if len(s) < 64:
            continue
        p = int(rng.integers(0, len(s) - 64 + 1))
        kws.append(pack_kmers(s[p : p + 64], 64)[0])
        srcs.append(tx)
    kws = np.stack(kws)
    slots = img.mphf.lookup(kws)
    assert (slots >= 0).all()
    assert np.array_equal(img.kmer_keys[slots], kws)
    nodes = img.kmer_node[slots].astype(np.int64)
    for i, tx in enumerate(srcs):
        ec = img.ec_list(int(img.node_ec[nodes[i]]))
        assert tx in ec.tolist()
        assert (np.diff(ec.astype(np.int64)) > 0).all()

    # self-mapping sample (src/build_index.rs:301-312 semantics)
    golden = GoldenAligner(img)
    for tx in rng.choice(len(seqs), 25, replace=False):
        s = seqs[int(tx)]
        if len(s) < 64:
            continue
        r = golden.map_read(s)
        assert r is not None and r[1] == len(s)
        assert int(tx) in r[0] or r[0] == [int(tx)]

    cfg = AlignerConfig(k=64, batch_size=256, max_read_len=96,
                        max_nodes=64, distinct_cap=16)
    al = Pseudoaligner(img, cfg)
    B, L = 256, 96
    codes = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i in range(B):
        s = seqs[int(rng.integers(0, len(seqs)))]
        if len(s) < L:
            s = np.concatenate([s, np.zeros(L - len(s), np.uint8)])
        st = int(rng.integers(0, max(1, len(s) - L)))
        codes[i, :L] = s[st : st + L]
        lens[i] = L

    from pseudoaligner_tpu.io.fastq import ReadBatch

    batch = ReadBatch(codes=codes, lens=lens,
                      ids=[f"q{i}" for i in range(B)])
    recs = al.records_from_result(al.map_batch_device(codes, lens), batch)
    for i in range(0, B, 9):
        g = golden.map_read(codes[i, : lens[i]])
        if g is None:
            assert recs[i].coverage == 0 and recs[i].eq_class == []
        else:
            assert recs[i].eq_class == g[0]
            assert recs[i].coverage == g[1]


@pytest.mark.full
def test_huge_transcriptome_200k_csr():
    """>=200k transcripts: equivalence classes are too wide for device
    bitsets (n_txs >> bitset_tx_threshold), so serving runs the CSR-merge
    EC path end to end; map parity vs golden on a sample."""
    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.golden import GoldenAligner
    from pseudoaligner_tpu.index.builder import build_index
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    rng = np.random.default_rng(17)
    n_genes = 100_000
    lens_g = rng.integers(120, 240, n_genes)
    pool = rng.integers(0, 4, int(lens_g.sum()), dtype=np.int8).astype(np.uint8)
    offs = np.zeros(n_genes + 1, np.int64)
    np.cumsum(lens_g, out=offs[1:])
    seqs, names, gene_map = [], [], {}
    for g in range(n_genes):
        base = pool[offs[g] : offs[g + 1]]
        iso = base.copy()  # SNP isoform: shares almost every kmer
        p = int(lens_g[g]) // 2
        iso[p] = (iso[p] + 1) % 4
        for i, s in enumerate((base, iso)):
            nm = f"t{g}_{i}"
            seqs.append(s)
            names.append(nm)
            gene_map[nm] = f"g{g}"
    assert len(seqs) == 200_000
    img = build_index(seqs, names, gene_map, k=20)
    assert img.n_tx == 200_000

    cfg = AlignerConfig(k=20, batch_size=256, max_read_len=64,
                        max_nodes=16, distinct_cap=3,
                        max_walk_iters=3, max_left_iters=2)
    assert img.n_tx > cfg.bitset_tx_threshold  # CSR-merge serving path
    al = Pseudoaligner(img, cfg)
    golden = GoldenAligner(img)
    B, L = 256, 64
    codes = np.zeros((B, L), dtype=np.uint8)
    lens = np.full(B, 60, np.int32)
    for i in range(B):
        s = seqs[int(rng.integers(0, len(seqs)))]
        st = int(rng.integers(0, max(1, len(s) - 60)))
        w = s[st : st + 60]
        codes[i, : len(w)] = w
        lens[i] = len(w)

    from pseudoaligner_tpu.io.fastq import ReadBatch

    batch = ReadBatch(codes=codes, lens=lens,
                      ids=[f"h{i}" for i in range(B)])
    recs = al.records_from_result(al.map_batch_device(codes, lens), batch)
    wide = 0
    for i in range(0, B, 5):
        g = golden.map_read(codes[i, : lens[i]])
        if g is None:
            assert recs[i].coverage == 0 and recs[i].eq_class == []
        else:
            assert recs[i].eq_class == g[0], i
            assert recs[i].coverage == g[1], i
            wide += len(g[0]) > 1
    assert wide > 0  # the SNP-isoform families produce multi-tx classes


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
