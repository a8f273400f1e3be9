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


def test_device_image_disk_cache(small_index, tmp_path):
    """Derived device-image arrays disk-cache beside the index (VERDICT
    r3 #8): second construction loads bit-identical arrays from the
    .dev-*.npz, and the cache key tracks the index file identity."""
    import os

    import numpy as np

    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.ops.map_kernel import device_index_from_image
    from pseudoaligner_tpu.serde import load_index, save_index

    p = str(tmp_path / "idx.bin")
    save_index(small_index, p)
    image = load_index(p)
    assert hasattr(image, "source_ident")
    cfg = AlignerConfig(k=20, batch_size=256, max_read_len=64, max_nodes=8,
                        distinct_cap=3, max_walk_iters=3, max_left_iters=2)
    dev1, meta1 = device_index_from_image(image, cfg)
    caches = [f for f in os.listdir(tmp_path) if ".dev-" in f]
    assert len(caches) == 1
    dev2, meta2 = device_index_from_image(image, cfg)
    assert meta1 == meta2
    for a, b, name in zip(dev1, dev2, dev1._fields):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    # an in-memory image (no source file) never writes a cache
    dev3, _ = device_index_from_image(small_index, cfg)
    assert len([f for f in os.listdir(tmp_path) if ".dev-" in f]) == 1
    for a, b, name in zip(dev1, dev3, dev1._fields):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_corrupt_and_truncated_index_raise(small_index, tmp_path):
    """Damaged index files must raise (ValueError family), never load as
    garbage: wrong magic, unsupported version, truncation at several
    depths (inside the header, inside the array payload)."""
    import json
    import pytest

    p = str(tmp_path / "idx.bin")
    save_index(small_index, p)
    raw = open(p, "rb").read()

    bad_magic = tmp_path / "m.bin"
    bad_magic.write_bytes(b"XX" + raw[2:])
    with pytest.raises(ValueError, match="not a pseudoaligner_tpu index"):
        load_index(str(bad_magic))

    # bump the version inside the JSON header (same length: 1 -> 9)
    hdr_start = raw.index(b'{"version"')
    bad_ver = tmp_path / "v.bin"
    bad_ver.write_bytes(raw.replace(b'{"version": 1', b'{"version": 9', 1))
    with pytest.raises(ValueError, match="unsupported index version"):
        load_index(str(bad_ver))

    for cut_at in (hdr_start + 4,               # inside the JSON header
                   int(len(raw) * 0.9)):        # inside the array payload
        cut = tmp_path / f"t{cut_at}.bin"
        cut.write_bytes(raw[:cut_at])
        with pytest.raises((ValueError, KeyError)):
            load_index(str(cut), mmap=False)
