"""Native scalar mapper vs the golden oracle — bit-exact on every bundled
read (coverage, mismatches, node multiset, and derived EC)."""

import numpy as np
import pytest

from pseudoaligner_tpu.ops.native import HostMapper


@pytest.fixture(scope="module")
def mapper(small_index):
    return HostMapper(small_index)


def test_host_mapper_matches_golden_bundled(small_index, small_reads, mapper):
    from pseudoaligner_tpu.golden import GoldenAligner

    golden = GoldenAligner(small_index)
    L = 64
    n = len(small_reads)
    codes = np.zeros((n, L), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    for i, (_, c) in enumerate(small_reads):
        codes[i, : len(c)] = c[:L]
        lens[i] = min(len(c), L)
    cov, mm, nodes, nn = mapper.map_reads(codes, lens)

    n_mapped = 0
    for i in range(n):
        g = golden.map_read_to_nodes_with_mismatch(codes[i, : lens[i]], 2)
        if g is None:
            assert nn[i] == 0 and cov[i] == 0, i
            continue
        gcov, gmm, gnodes = g
        n_mapped += 1
        assert cov[i] == gcov, i
        assert mm[i] == gmm, i
        assert nodes[i, : nn[i]].tolist() == gnodes, i
    assert n_mapped > 0


def test_host_mapper_matches_golden_k64(small_transcripts):
    """k=64 (4-word k-mers) through the native mapper vs golden."""
    from pseudoaligner_tpu.golden import GoldenAligner
    from pseudoaligner_tpu.index.builder import build_index

    seqs, names, gene_map = small_transcripts
    seqs, names = seqs[:40], names[:40]
    gene_map = {n: gene_map[n] for n in names}
    image = build_index(seqs, names, gene_map, k=64)
    golden = GoldenAligner(image)
    m = HostMapper(image)

    rng = np.random.default_rng(17)
    L = 90
    reads = []
    for s in seqs:
        if len(s) < L:
            continue
        st = int(rng.integers(0, len(s) - L + 1))
        w = np.asarray(s[st : st + L]).copy()
        reads.append(w)
        v = w.copy()
        v[int(rng.integers(0, L))] = (v[int(rng.integers(0, L))] + 1) % 4
        reads.append(v)
        reads.append(w[::-1].copy())
    n = len(reads)
    codes = np.zeros((n, L), dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i] = r
    lens = np.full(n, L, dtype=np.int32)
    cov, mm, nodes, nn = m.map_reads(codes, lens)
    n_mapped = 0
    for i in range(n):
        g = golden.map_read_to_nodes_with_mismatch(codes[i], 2)
        if g is None:
            assert nn[i] == 0, i
        else:
            n_mapped += 1
            assert (cov[i], mm[i], nodes[i, : nn[i]].tolist()) == (
                g[0], g[1], g[2]), i
    assert n_mapped > 0


def test_host_mapper_matches_golden_snp_variants(small_index, small_reads, mapper):
    """1- and 3-SNP variants exercise the mismatch budget + re-seed paths."""
    from pseudoaligner_tpu.golden import GoldenAligner

    golden = GoldenAligner(small_index)
    rng = np.random.default_rng(5)
    L = 64
    base = [c for _, c in small_reads[:300] if len(c) >= 60]
    reads = []
    for c in base:
        c = c[:L].copy()
        for nsnp in (1, 3):
            v = c.copy()
            pos = rng.integers(0, len(v), size=nsnp)
            v[pos] = (v[pos] + 1) % 4
            reads.append(v)
    n = len(reads)
    codes = np.zeros((n, L), dtype=np.uint8)
    lens = np.array([len(r) for r in reads], dtype=np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = r
    cov, mm, nodes, nn = mapper.map_reads(codes, lens)
    for i in range(n):
        g = golden.map_read_to_nodes_with_mismatch(codes[i, : lens[i]], 2)
        if g is None:
            assert nn[i] == 0, i
        else:
            assert (cov[i], mm[i], nodes[i, : nn[i]].tolist()) == (
                g[0], g[1], g[2]), i
