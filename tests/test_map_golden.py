"""Golden-mapper behavior tests, including the reference's documented
alignment expectations (src/build_index.rs:424-451: read and 1-SNP variant
map to EC [1, 30] with full coverage)."""

import numpy as np
import pytest

from pseudoaligner_tpu.dna import encode_bases
from pseudoaligner_tpu.golden import GoldenAligner


@pytest.fixture(scope="module")
def aligner(full_index):
    return GoldenAligner(full_index)


EX1 = "GGCTGTCAACCAGTCCATAGGCAGGGCCATCAGGCACCAAAGGGATTCTGCCAGCATAGT"
SNP1 = "GGCTGTCAACCAGTCCATAGGCGGGGCCATCAGGCACCAAAGGGATTCTGCCAGCATAGT"


@pytest.mark.full
def test_alignment_exact(aligner):
    read = encode_bases(EX1)
    eq_class, nbases = aligner.map_read(read)
    assert eq_class == [1, 30]
    assert nbases == len(read)


@pytest.mark.full
def test_alignment_single_snp(aligner):
    read = encode_bases(SNP1)
    eq_class, nbases = aligner.map_read(read)
    assert eq_class == [1, 30]
    assert nbases == len(read)


def test_short_read_unmapped(small_index):
    al = GoldenAligner(small_index)
    read = encode_bases("ACGTACGTACGT")  # shorter than k=20
    assert al.map_read(read) is None


def test_random_read_unmapped(small_index):
    al = GoldenAligner(small_index)
    rng = np.random.default_rng(7)
    read = rng.integers(0, 4, size=60).astype(np.uint8)
    r = al.map_read(read)
    # random 60-mer almost surely finds no 20-mer seed
    assert r is None or r[1] < 60


def test_lazy_golden_matches_eager(small_index, small_reads):
    eager = GoldenAligner(small_index)
    lazy = GoldenAligner(small_index, lazy=True)
    for rid, read in small_reads[:20]:
        assert eager.map_read(read) == lazy.map_read(read), rid
