"""Native C++ census vs NumPy census — bit-identical CensusProduct and
IndexImage."""

import numpy as np
import pytest

from pseudoaligner_tpu.index.builder import assemble, build_index, census_numpy

native = pytest.importorskip("pseudoaligner_tpu.index.native")


def _compare_census(a, b):
    assert np.array_equal(a.kmer_words, b.kmer_words)
    assert np.array_equal(a.kmer_exts, b.kmer_exts)
    assert np.array_equal(a.ec_of_kmer, b.ec_of_kmer)
    assert np.array_equal(a.ec_offsets, b.ec_offsets)
    assert np.array_equal(a.ec_txs, b.ec_txs)
    assert np.array_equal(a.nxt, b.nxt)


@pytest.mark.parametrize("k", [20, 64])
def test_native_census_matches_numpy_random(k):
    rng = np.random.default_rng(11)
    seqs = [rng.integers(0, 4, size=int(n)).astype(np.uint8)
            for n in rng.integers(10, 400, size=30)]
    # include a duplicate and a poly-A (self-loop kmer) sequence
    seqs.append(seqs[0].copy())
    seqs.append(np.zeros(80, dtype=np.uint8))
    a = census_numpy(seqs, k)
    b = native.census_native(seqs, k)
    _compare_census(a, b)


def test_native_census_matches_numpy_transcripts(small_transcripts):
    seqs, names, gene_map = small_transcripts
    a = census_numpy(seqs, 20)
    b = native.census_native(seqs, 20)
    _compare_census(a, b)
    img_a = assemble(a, 20, names, gene_map)
    img_b = assemble(b, 20, names, gene_map)
    for f in ("node_start", "node_len", "node_exts", "node_ec", "seq_pool",
              "l_edge", "r_edge", "ec_offsets", "ec_txs", "kmer_node",
              "kmer_offset", "kmer_keys"):
        assert np.array_equal(getattr(img_a, f), getattr(img_b, f)), f


def test_build_index_native_require(small_transcripts):
    """native='require' now runs the C++ graph assembly too — the full
    IndexImage must be bit-identical to the NumPy pipeline."""
    seqs, names, gene_map = small_transcripts
    img = build_index(seqs, names, gene_map, k=20, native="require")
    img2 = build_index(seqs, names, gene_map, k=20, native="never")
    for f in ("node_start", "node_len", "node_exts", "node_ec", "seq_pool",
              "l_edge", "r_edge", "ec_offsets", "ec_txs", "kmer_node",
              "kmer_offset", "kmer_keys"):
        assert np.array_equal(getattr(img, f), getattr(img2, f)), f
    for f in ("seeds", "masks", "word_offsets", "key_offsets", "bits",
              "ranks"):
        assert np.array_equal(getattr(img.mphf, f), getattr(img2.mphf, f)), f


def test_build_index_native_require_k64(small_transcripts):
    seqs, names, gene_map = small_transcripts
    img = build_index(seqs[:40], names[:40],
                      {n: gene_map[n] for n in names[:40]},
                      k=64, native="require")
    img2 = build_index(seqs[:40], names[:40],
                       {n: gene_map[n] for n in names[:40]},
                       k=64, native="never")
    for f in ("node_start", "node_len", "node_exts", "node_ec", "seq_pool",
              "l_edge", "r_edge", "kmer_node", "kmer_offset", "kmer_keys"):
        assert np.array_equal(getattr(img, f), getattr(img2, f)), f
