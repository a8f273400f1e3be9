"""FASTA reader parity edges (rust-bio Record semantics, review r5)."""

import pytest

from pseudoaligner_tpu.io.fasta import (
    detect_fasta_format,
    iter_fasta,
    read_transcripts,
)


def test_trailing_whitespace_trimmed_from_seq_lines(tmp_path):
    """rust-bio trim_end()s every line: a trailing space/tab on a
    sequence line must not become a phantom substituted base."""
    p = tmp_path / "a.fa"
    p.write_text(">tx1|a|b|c|d|e|f|g|h desc\nACGT \nGGCC\t\n")
    (rec,) = iter_fasta(str(p))
    assert rec.seq == b"ACGTGGCC"
    seqs, ids, gmap = read_transcripts(str(p))
    assert len(seqs[0]) == 8  # no substitution warning path


def test_header_splits_at_first_whitespace_verbatim_rest(tmp_path):
    """splitn(2, is_whitespace): a run of spaces is NOT collapsed — the
    desc keeps the remainder verbatim (token indices must match the
    reference's desc.split(' ') positions)."""
    p = tmp_path / "b.fa"
    p.write_text(">tx1  cdna x gene:G1 y\nACGT\n")
    (rec,) = iter_fasta(str(p))
    assert rec.id == "tx1"
    assert rec.desc == " cdna x gene:G1 y"


def test_ensembl_acceptance_requires_gene_field(tmp_path):
    """A coincidental 5-token description (NCBI style) must hit the
    clean detection error, not a bare IndexError or a bogus gene id."""
    p = tmp_path / "c.fa"
    p.write_text(">NR_1 Homo sapiens DDX11L1 transcript variant\nACGT\n")
    (rec,) = iter_fasta(str(p))
    with pytest.raises(ValueError, match="Failed to detect"):
        detect_fasta_format(rec)
    # the real Ensembl shape still detects
    p.write_text(">ENST1 cdna chromosome:GRCh38 gene:ENSG1 "
                 "gene_biotype:x transcript_biotype:y\nACGT\n")
    (rec,) = iter_fasta(str(p))
    assert detect_fasta_format(rec).name == "ENSEMBL"


def test_content_before_first_header_raises(tmp_path):
    """rust-bio: 'Expected > at record start' — orphan sequence lines
    must not be silently discarded."""
    p = tmp_path / "d.fa"
    p.write_text("ACGT\n>tx1 gene=G1\nACGT\n")
    with pytest.raises(ValueError, match="Expected >"):
        list(iter_fasta(str(p)))
