import numpy as np

from pseudoaligner_tpu.serde import load_index, save_index


def test_index_roundtrip(small_index, tmp_path):
    p = str(tmp_path / "idx.bin")
    save_index(small_index, p)
    for mmap in (True, False):
        img = load_index(p, mmap=mmap)
        a, b = small_index, img
        assert a.k == b.k
        for name in (
            "node_start",
            "node_len",
            "node_exts",
            "node_ec",
            "seq_pool",
            "l_edge",
            "r_edge",
            "ec_offsets",
            "ec_txs",
            "kmer_node",
            "kmer_offset",
            "kmer_keys",
        ):
            assert np.array_equal(getattr(a, name), getattr(b, name)), name
        for name in ("seeds", "masks", "word_offsets", "key_offsets", "bits", "ranks"):
            assert np.array_equal(getattr(a.mphf, name), getattr(b.mphf, name)), name
        assert a.mphf.n_keys == b.mphf.n_keys
        assert a.tx_names == b.tx_names
        assert a.tx_gene_mapping == b.tx_gene_mapping


def test_loaded_index_maps_identically(small_index, small_reads, tmp_path):
    from pseudoaligner_tpu.golden import GoldenAligner

    p = str(tmp_path / "idx.bin")
    save_index(small_index, p)
    img = load_index(p)
    g1 = GoldenAligner(small_index)
    g2 = GoldenAligner(img)
    for rid, read in small_reads[:50]:
        assert g1.map_read(read) == g2.map_read(read), rid
