"""MSP partitioning properties (incl. the reference's group_by_slices
proptest, src/build_index.rs:370-392)."""

import numpy as np

from pseudoaligner_tpu.dna import pack_kmers
from pseudoaligner_tpu.index.msp import (
    group_by_slices,
    partition_contigs,
    pmer_values,
    simple_scan,
)


def test_group_by_slices_properties():
    rng = np.random.default_rng(5)
    for _ in range(2000):
        n = int(rng.integers(0, 500))
        v = rng.integers(0, 100, size=n).tolist()
        min_sz = int(rng.integers(1, 200))
        res = group_by_slices(v, lambda x: x, min_sz)
        # partitions cover the input
        assert sum(len(x) for x in res) == len(v)
        flat = [x for part in res for x in part]
        assert flat == v
        # all but the last subslice respect the min size
        for part in res[:-1]:
            assert len(part) >= min_sz
        # never split an equal-key run
        for a, b in zip(res, res[1:]):
            assert a[-1] != b[0]


def test_spans_tile_all_kmers():
    rng = np.random.default_rng(6)
    k = 20
    for _ in range(20):
        n = int(rng.integers(k, 400))
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        spans = simple_scan(k, codes)
        covered = []
        for iv in spans:
            assert iv.len >= k
            covered.extend(range(iv.start, iv.end - k + 1))
        # every kmer position exactly once, in order
        assert covered == list(range(n - k + 1))


def test_bucket_is_function_of_kmer():
    """All occurrences of a k-mer (across contigs) share one bucket."""
    rng = np.random.default_rng(7)
    k = 20
    base = rng.integers(0, 4, size=300).astype(np.uint8)
    # duplicate a chunk into another contig
    contigs = [base, np.concatenate([rng.integers(0, 4, 50).astype(np.uint8), base[40:140]])]
    seen = {}
    for cid, c in enumerate(contigs):
        kws = pack_kmers(c, k)
        for iv in simple_scan(k, c):
            for pos in range(iv.start, iv.end - k + 1):
                key = tuple(kws[pos])
                if key in seen:
                    assert seen[key] == iv.bucket, key
                else:
                    seen[key] = iv.bucket


def test_minimizer_is_min_pmer_of_window():
    rng = np.random.default_rng(8)
    k, p = 20, 6
    codes = rng.integers(0, 4, size=200).astype(np.uint8)
    pv = pmer_values(codes, p)
    for iv in simple_scan(k, codes):
        for pos in range(iv.start, iv.end - k + 1):
            assert iv.bucket == int(pv[pos : pos + k - p + 1].min())


def test_partition_contigs_exts():
    codes = np.array([0, 1, 2, 3] * 10, dtype=np.uint8)
    parts = partition_contigs(codes, 7, 20)
    assert sum(iv[2][1] - iv[2][0] - 19 for iv in parts) == len(codes) - 19
    first = parts[0]
    assert first[1] == 7
    assert first[2][0] == 0
    # first span has no left ext; has right ext unless span covers the end
    if first[2][1] < len(codes):
        assert (first[3] & 0x0F) != 0
        assert (first[3] & 0xF0) == 0
