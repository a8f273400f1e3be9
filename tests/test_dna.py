import numpy as np

from pseudoaligner_tpu import dna


def test_encode_decode_roundtrip():
    s = "ACGTACGTTTGCA"
    codes = dna.encode_bases(s)
    assert dna.decode_bases(codes) == s


def test_encode_lowercase_and_unknown():
    codes = dna.encode_bases("acgtN")
    assert list(codes[:4]) == [0, 1, 2, 3]
    assert codes[4] == 255


def test_pack_kmers_matches_pyint():
    rng = np.random.default_rng(0)
    for k in (4, 20, 31, 32, 33, 64):
        codes = rng.integers(0, 4, size=100).astype(np.uint8)
        kws = dna.pack_kmers(codes, k)
        assert kws.shape == (100 - k + 1, dna.kmer_words(k))
        for pos in sorted({0, 1, min(37, 100 - k), 100 - k}):
            expect = 0
            for i in range(k):
                expect = (expect << 2) | int(codes[pos + i])
            assert dna.kmer_to_pyint(kws[pos]) == expect
            # roundtrips
            assert np.array_equal(dna.pyint_to_kmer(expect, k), kws[pos])
            assert np.array_equal(dna.kmer_to_codes(kws[pos], k), codes[pos : pos + k])


def test_kmer_str():
    codes = dna.encode_bases("ACGTACGT")
    kws = dna.pack_kmers(codes, 5)
    assert dna.kmer_str(kws[0], 5) == "ACGTA"
    assert dna.kmer_str(kws[3], 5) == "TACGT"


def test_pack_2bit_roundtrip():
    rng = np.random.default_rng(1)
    for n in (0, 1, 15, 16, 17, 100):
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        words = dna.pack_codes_2bit(codes)
        assert np.array_equal(dna.unpack_codes_2bit(words, n), codes)


def test_hashn_deterministic():
    seq = b"ACGTNNNACGT"
    a = dna.from_acgt_bytes_hashn(seq, b"tx1")
    b = dna.from_acgt_bytes_hashn(seq, b"tx1")
    c = dna.from_acgt_bytes_hashn(seq, b"tx2")
    assert np.array_equal(a, b)
    assert (a < 4).all()
    # clean bases unchanged
    assert np.array_equal(a[:4], dna.encode_bases("ACGT"))
    # different record ids may give different substitutions (not required,
    # but the clean positions always agree)
    assert np.array_equal(a[:4], c[:4])


def test_hashn_pinned_divergence():
    """KNOWN REFERENCE DIVERGENCE (VERDICT r3 #6): the reference's
    N-substitution lives in the unvendored debruijn crate
    (DnaString::from_acgt_bytes_hashn, called at src/utils.rs:76) and is
    unobservable offline; this framework's documented FNV-1a(id) +
    position -> fmix32 scheme is pinned HERE so any change to it is a
    deliberate, test-visible event (indexes built from N-containing
    FASTAs would silently change otherwise)."""
    got = dna.from_acgt_bytes_hashn(b"ACGNNTNGACGT", b"tx_with_N")
    assert got.tolist() == [0, 1, 2, 1, 3, 3, 1, 2, 0, 1, 2, 3]
    got2 = dna.from_acgt_bytes_hashn(b"NNNN", b"other_id")
    assert got2.tolist() == [3, 2, 0, 1]


def test_n_fasta_warns_and_is_deterministic(tmp_path, caplog):
    """read_transcripts on an N-containing FASTA fires the one-line
    divergence warning and produces deterministic codes."""
    import logging

    from pseudoaligner_tpu.io.fasta import read_transcripts

    fa = tmp_path / "n.fa"
    fa.write_text(
        ">tx1|g1|x|x|x|x|x|x|\nACGTNNACGTACGTACGTACGTNACGT\n"
        ">tx2|g2|x|x|x|x|x|x|\nACGTACGTACGTACGTACGTACGT\n"
    )
    with caplog.at_level(logging.WARNING):
        seqs_a, names, gmap = read_transcripts(str(fa))
    assert any("substituted" in r.message and "divergence" in r.message
               for r in caplog.records)
    seqs_b, _, _ = read_transcripts(str(fa))
    assert all(np.array_equal(a, b) for a, b in zip(seqs_a, seqs_b))
    assert all((s < 4).all() for s in seqs_a)
