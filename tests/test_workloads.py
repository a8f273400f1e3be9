"""Workload configs: TCC aggregation, paired-end mapping, 10x single-cell
counting (BASELINE configs 3-4)."""

import os

import numpy as np
import pytest

from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.dna import decode_bases
from pseudoaligner_tpu.models.aligner import Pseudoaligner
from pseudoaligner_tpu.tcc import TccCounter


@pytest.fixture(scope="module")
def aligner(small_index):
    cfg = AlignerConfig(k=20, batch_size=64, max_read_len=96, max_nodes=64)
    return Pseudoaligner(small_index, cfg)


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")


def _tx_window(small_transcripts, tx, start, ln):
    seqs, _, _ = small_transcripts
    return decode_bases(seqs[tx][start : start + ln])


def test_tcc_counter_basics():
    c = TccCounter()
    c.add([1, 2, 3])
    c.add([1, 2, 3])
    c.add([5])
    c.add([], mapped=False)
    assert c.n_reads == 4 and c.n_mapped == 3
    assert c.counts == [2, 1]
    d = TccCounter()
    d.add([5])
    d.add([9, 10])
    c.merge(d)
    assert c.counts == [2, 2, 1]
    assert c.n_reads == 6


def test_tcc_write(tmp_path):
    c = TccCounter()
    c.add([1, 2])
    c.add([1, 2])
    c.add([7])
    ec, tsv = c.write(str(tmp_path))
    assert open(ec).read() == "0\t1,2\n1\t7\n"
    assert open(tsv).read() == "0\t2\n1\t1\n"


def test_paired_end(aligner, small_transcripts, tmp_path):
    # mates from the same transcript: EC intersection keeps the transcript
    r1 = [("p0", _tx_window(small_transcripts, 3, 10, 60)),
          ("p1", _tx_window(small_transcripts, 5, 0, 60))]
    r2 = [("p0", _tx_window(small_transcripts, 3, 200, 60)),
          ("p1", "A" * 60)]  # second mate unmapped
    _write_fastq(tmp_path / "r1.fq", r1)
    _write_fastq(tmp_path / "r2.fq", r2)
    recs = list(aligner.map_fastq_paired(str(tmp_path / "r1.fq"),
                                         str(tmp_path / "r2.fq")))
    assert len(recs) == 2
    assert 3 in recs[0].eq_class
    # single-mate fallback: pair 1 uses mate 1's class
    single = list(aligner.map_fastq(str(tmp_path / "r1.fq")))
    assert recs[1].eq_class == single[1].eq_class
    assert recs[1].coverage == single[1].coverage


def test_paired_vs_singles_intersection(aligner, small_transcripts, tmp_path):
    from pseudoaligner_tpu.golden import intersect

    r1 = [("q", _tx_window(small_transcripts, 10, 5, 60))]
    r2 = [("q", _tx_window(small_transcripts, 10, 90, 60))]
    _write_fastq(tmp_path / "a.fq", r1)
    _write_fastq(tmp_path / "b.fq", r2)
    (pa,) = aligner.map_fastq_paired(str(tmp_path / "a.fq"), str(tmp_path / "b.fq"))
    (sa,) = aligner.map_fastq(str(tmp_path / "a.fq"))
    (sb,) = aligner.map_fastq(str(tmp_path / "b.fq"))
    assert pa.eq_class == intersect(list(sa.eq_class), sb.eq_class)
    assert pa.coverage == sa.coverage + sb.coverage


def test_single_cell_count(aligner, small_transcripts, tmp_path):
    from pseudoaligner_tpu.singlecell import Chemistry, count_single_cell

    bc1, bc2 = "A" * 16, "C" * 16
    # cell 1: two reads same UMI (dedup to 1) + one distinct; cell 2: one
    r1 = [
        ("m0", bc1 + "G" * 12),
        ("m1", bc1 + "G" * 12),
        ("m2", bc1 + "T" * 12),
        ("m3", bc2 + "G" * 12),
        ("m4", bc2 + "X"),  # too short -> bad R1
    ]
    cdna = _tx_window(small_transcripts, 7, 30, 60)
    r2 = [("m%d" % i, cdna) for i in range(5)]
    _write_fastq(tmp_path / "r1.fq", r1)
    _write_fastq(tmp_path / "r2.fq", r2)
    counts = count_single_cell(
        aligner, str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"), Chemistry()
    )
    assert counts.n_reads == 5
    assert counts.n_bad_r1 == 1
    assert len(counts.cells) == 2
    counts.write(str(tmp_path / "out"))
    mtx = open(tmp_path / "out" / "matrix.mtx").read().splitlines()
    dims = mtx[2].split()
    assert dims == ["2", "1", "2"]  # 2 cells, 1 class, 2 entries
    entries = {(int(a), int(b)): int(c) for a, b, c in (ln.split() for ln in mtx[3:])}
    # cell 1 has 2 distinct UMIs for the class, cell 2 has 1
    assert entries[(1, 1)] == 2
    assert entries[(2, 1)] == 1
    barcodes = open(tmp_path / "out" / "barcodes.tsv").read().split()
    assert barcodes == [bc1, bc2]


def test_whitelist_match_and_correct():
    from pseudoaligner_tpu.singlecell import Whitelist

    wl = Whitelist(["A" * 16, "C" * 16, "A" * 15 + "G"], bc_len=16)
    # exact
    assert wl.match(b"A" * 16) == "A" * 16
    # unique 1-Hamming correction (T at pos 0 -> only CCCC... is 1 away? no:
    # TAAA... is 1 away from AAAA... only) -> corrects
    assert wl.match(b"T" + b"A" * 15) == "A" * 16
    # ambiguous: AAAA...AT is 1 away from both AAAA...AA and AAAA...AG
    assert wl.match(b"A" * 15 + b"T") is None
    # single N corrects to the unique fill-in
    assert wl.match(b"N" + b"C" * 15) == "C" * 16
    # N where two fill-ins exist -> ambiguous -> drop
    assert wl.match(b"A" * 15 + b"N") is None
    # two Ns -> drop
    assert wl.match(b"NN" + b"A" * 14) is None
    # >1 mismatch -> drop
    assert wl.match(b"T" * 16) is None


def test_single_cell_count_whitelist(aligner, small_transcripts, tmp_path):
    from pseudoaligner_tpu.singlecell import (
        Chemistry,
        Whitelist,
        count_single_cell,
    )

    bc1, bc2 = "A" * 16, "C" * 16
    wl = Whitelist([bc1, bc2], bc_len=16)
    r1 = [
        ("m0", bc1 + "G" * 12),            # exact
        ("m1", "T" + bc1[1:] + "G" * 12),  # corrects to bc1, same UMI
        ("m2", bc1 + "T" * 12),            # exact, distinct UMI
        ("m3", "N" + bc2[1:] + "G" * 12),  # N corrects to bc2
        ("m4", "GT" + bc2[2:] + "G" * 12), # 2 mismatches -> dropped
    ]
    cdna = _tx_window(small_transcripts, 7, 30, 60)
    r2 = [("m%d" % i, cdna) for i in range(5)]
    _write_fastq(tmp_path / "r1.fq", r1)
    _write_fastq(tmp_path / "r2.fq", r2)
    counts = count_single_cell(
        aligner, str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"),
        Chemistry(), whitelist=wl,
    )
    assert counts.n_reads == 5
    assert counts.n_corrected == 2
    assert counts.n_bad_barcode == 1
    assert sorted(counts.cells) == [bc1, bc2]
    counts.write(str(tmp_path / "out"))
    mtx = open(tmp_path / "out" / "matrix.mtx").read().splitlines()
    entries = {(int(a), int(b)): int(c) for a, b, c in (ln.split() for ln in mtx[3:])}
    # bc1: m0/m1 share a UMI, m2 distinct -> 2; bc2: m3 -> 1
    assert entries[(1, 1)] == 2
    assert entries[(2, 1)] == 1


def test_single_cell_count_long_barcode_whitelist(
        aligner, small_transcripts, tmp_path):
    """bc_len=33 exceeds the int64 2-bit packing budget, so the batched
    path must route every row through the per-row whitelist loop.  A
    whitelist with >64-bit packed codes crashed the batched path before
    any read (np.fromiter into uint64 overflowed — review r5)."""
    from pseudoaligner_tpu.singlecell import (
        Chemistry,
        Whitelist,
        count_single_cell,
    )

    bc1, bc2 = "A" * 33, "C" * 33
    wl = Whitelist([bc1, bc2], bc_len=33)
    r1 = [
        ("m0", bc1 + "G" * 12),            # exact
        ("m1", "T" + bc1[1:] + "G" * 12),  # corrects to bc1, same UMI
        ("m2", "GT" + bc2[2:] + "G" * 12), # 2 mismatches -> dropped
    ]
    cdna = _tx_window(small_transcripts, 7, 30, 60)
    r2 = [("m%d" % i, cdna) for i in range(3)]
    _write_fastq(tmp_path / "r1.fq", r1)
    _write_fastq(tmp_path / "r2.fq", r2)
    counts = count_single_cell(
        aligner, str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"),
        Chemistry(bc_len=33, umi_len=12), whitelist=wl,
    )
    assert counts.n_reads == 3
    assert counts.n_corrected == 1
    assert counts.n_bad_barcode == 1
    assert sorted(counts.cells) == [bc1]
    counts.write(str(tmp_path / "out33"))
    mtx = open(tmp_path / "out33" / "matrix.mtx").read().splitlines()
    entries = {(int(a), int(b)): int(c)
               for a, b, c in (ln.split() for ln in mtx[3:])}
    assert entries == {(1, 1): 1}  # m0/m1 share one UMI in one cell


def test_count_batched_matches_record_path(small_index, small_transcripts, tmp_path):
    """The batched (compact-signature) counting path writes identical
    outputs to the per-record path: same cells, classes, matrix, stats."""
    from pseudoaligner_tpu.singlecell import Chemistry, count_single_cell

    rng = np.random.default_rng(11)
    bcs = ["".join("ACGT"[b] for b in rng.integers(0, 4, 16)) for _ in range(5)]
    r1, r2 = [], []
    for i in range(120):
        bc = bcs[int(rng.integers(0, len(bcs)))]
        umi = "".join("ACGT"[b] for b in rng.integers(0, 4, 12))
        tx = int(rng.integers(0, 40))
        cdna = _tx_window(small_transcripts, tx, 10, 60)
        r1.append((f"m{i}", bc + umi))
        r2.append((f"m{i}", cdna))
    _write_fastq(tmp_path / "r1.fq", r1)
    _write_fastq(tmp_path / "r2.fq", r2)

    outs = []
    for dc in (12, 0):  # batched (compact) vs record (full-output) path
        cfg = AlignerConfig(k=20, batch_size=32, max_read_len=96,
                            max_nodes=64, distinct_cap=dc,
                            max_walk_iters=6 if dc else 0)
        al = Pseudoaligner(small_index, cfg)
        c = count_single_cell(al, str(tmp_path / "r1.fq"),
                              str(tmp_path / "r2.fq"), Chemistry())
        d = str(tmp_path / f"out{dc}")
        c.write(d)
        outs.append((c, {
            f: open(os.path.join(d, f)).read()
            for f in ("barcodes.tsv", "ec.tsv", "matrix.mtx")
        }))
    (ca, fa), (cb, fb) = outs
    assert (ca.n_reads, ca.n_mapped, ca.n_bad_r1) == (
        cb.n_reads, cb.n_mapped, cb.n_bad_r1)
    assert fa == fb


def test_count_batched_parity_fuzz(small_index, small_transcripts, tmp_path):
    """Adversarial count parity: UMI duplication, N/lowercase barcodes
    and UMIs (face-value side path), short R1s, whitelist corrections and
    drops, reads that overflow distinct_cap — batched (vectorized) vs
    record path must write identical outputs on every axis."""
    from pseudoaligner_tpu.singlecell import (
        Chemistry,
        Whitelist,
        count_single_cell,
    )

    rng = np.random.default_rng(23)
    bcs = ["".join("ACGT"[b] for b in rng.integers(0, 4, 16))
           for _ in range(6)]
    r1, r2 = [], []
    umis = ["".join("ACGT"[b] for b in rng.integers(0, 4, 12))
            for _ in range(25)]  # small pool -> heavy duplication
    for i in range(400):
        kind = i % 10
        bc = bcs[int(rng.integers(0, len(bcs)))]
        umi = umis[int(rng.integers(0, len(umis)))]
        if kind == 0:
            bc = bc[:4] + "N" + bc[5:]            # N barcode
        elif kind == 1:
            umi = umi[:3] + "N" + umi[4:]         # N umi
        elif kind == 2:
            bc = bc.lower()                       # lowercase barcode
        elif kind == 3:
            p = int(rng.integers(0, 16))          # 1-Hamming error
            bc = bc[:p] + "ACGT"[(("ACGT".index(bc[p])) + 1) % 4] + bc[p + 1:]
        elif kind == 4:
            r1.append((f"m{i}", bc + umi[:3]))    # too-short R1
            r2.append((f"m{i}", _tx_window(small_transcripts, 3, 10, 60)))
            continue
        tx = int(rng.integers(0, 60))
        r1.append((f"m{i}", bc + umi))
        r2.append((f"m{i}", _tx_window(small_transcripts, tx,
                                       int(rng.integers(0, 40)), 60)))
    _write_fastq(tmp_path / "r1.fq", r1)
    _write_fastq(tmp_path / "r2.fq", r2)

    for wl in (None, Whitelist(bcs, 16)):
        outs = []
        # (distinct_cap, native-keys env): the dc=3/numpy arm forces the
        # numpy fallback of the C++ count_r1keys derivation — all three
        # arms (native batched, numpy batched, record path) must agree
        for dc, nat in ((3, "1"), (3, "0"), (0, "1")):
            cfg = AlignerConfig(k=20, batch_size=64, max_read_len=96,
                                max_nodes=64 if not dc else 9,
                                distinct_cap=dc,
                                max_walk_iters=6 if dc else 0,
                                max_left_iters=2 if dc else 0)
            al = Pseudoaligner(small_index, cfg)
            os.environ["PA_NATIVE_COUNTKEYS"] = nat
            try:
                c = count_single_cell(al, str(tmp_path / "r1.fq"),
                                      str(tmp_path / "r2.fq"), Chemistry(),
                                      whitelist=wl, bc_correct=False)
            finally:
                os.environ.pop("PA_NATIVE_COUNTKEYS", None)
            d = str(tmp_path / f"out_{dc}_{nat}_{wl is None}")
            c.write(d, umi_dedup="directional")
            outs.append((c, {
                f: open(os.path.join(d, f)).read()
                for f in ("barcodes.tsv", "ec.tsv", "matrix.mtx")
            }))
        (ca, fa) = outs[0]
        for cb, fb in outs[1:]:
            assert (ca.n_reads, ca.n_mapped, ca.n_bad_r1, ca.n_bad_barcode,
                    ca.n_corrected) == (
                cb.n_reads, cb.n_mapped, cb.n_bad_r1, cb.n_bad_barcode,
                cb.n_corrected), ("stats", wl is None)
            assert fa == fb, ("files", wl is None)


def test_count_gz_inputs_match_plain(small_index, small_transcripts, tmp_path):
    """Gzipped R1/R2 through the count pipeline (R1PrefixReader falls back
    to the chunked python stream; R2 to the python record reader) must
    produce outputs identical to the plain-file native path."""
    import gzip

    from pseudoaligner_tpu.singlecell import Chemistry, count_single_cell

    rng = np.random.default_rng(41)
    bcs = ["".join("ACGT"[b] for b in rng.integers(0, 4, 16))
           for _ in range(4)]
    r1, r2 = [], []
    for i in range(150):
        bc = bcs[int(rng.integers(0, 4))]
        if i % 7 == 0:
            bc = bc[:2] + "N" + bc[3:]
        umi = "".join("ACGT"[b] for b in rng.integers(0, 4, 12))
        r1.append((f"g{i}", bc + umi))
        r2.append((f"g{i}", _tx_window(small_transcripts,
                                       int(rng.integers(0, 50)), 5, 60)))
    _write_fastq(tmp_path / "r1.fq", r1)
    _write_fastq(tmp_path / "r2.fq", r2)
    from pseudoaligner_tpu.io.fastq import write_bgzf

    for nm in ("r1.fq", "r2.fq"):
        data = open(tmp_path / nm, "rb").read()
        with gzip.open(tmp_path / (nm + ".gz"), "wb") as g:
            g.write(data)
        # bgzf variant: the native source's PARALLEL member path
        write_bgzf(str(tmp_path / (nm + ".bgz.gz")), data,
                   member_size=512)

    cfg = AlignerConfig(k=20, batch_size=64, max_read_len=96, max_nodes=9,
                        distinct_cap=3, max_walk_iters=3, max_left_iters=2)
    al = Pseudoaligner(small_index, cfg)
    outs = []
    for suffix in ("", ".gz", ".bgz.gz"):
        c = count_single_cell(
            al, str(tmp_path / f"r1.fq{suffix}"),
            str(tmp_path / f"r2.fq{suffix}"), Chemistry(), bc_correct=False)
        d = str(tmp_path / f"gzout{len(outs)}")
        c.write(d)
        outs.append({f: open(os.path.join(d, f)).read()
                     for f in ("barcodes.tsv", "ec.tsv", "matrix.mtx")})
    assert outs[0] == outs[1]
    assert outs[0] == outs[2]


def test_count_short_r1_errors_promptly(aligner, small_transcripts,
                                        tmp_path):
    """R1 shorter than R2 must raise (not hang): the error path aborts
    the prefetch worker and the render pipeline cleanly."""
    from pseudoaligner_tpu.singlecell import Chemistry, count_single_cell

    rng = np.random.default_rng(61)
    r2 = [(f"s{i}", _tx_window(small_transcripts, int(rng.integers(0, 50)),
                               5, 60)) for i in range(120)]
    r1 = [(f"s{i}", "ACGTACGTACGTACGT" + "ACGTACGTACGT")
          for i in range(40)]  # 40 < 120
    _write_fastq(tmp_path / "s1.fq", r1)
    _write_fastq(tmp_path / "s2.fq", r2)
    with pytest.raises(ValueError, match="R1 has fewer reads"):
        count_single_cell(aligner, str(tmp_path / "s1.fq"),
                          str(tmp_path / "s2.fq"), Chemistry())


def test_paired_gz_inputs_match_plain(aligner, small_transcripts, tmp_path):
    """Gzipped R1/R2 through the paired serving emitter must produce
    output byte-identical to the plain-file native path (the gz branch
    of the FastqReader feeds the same combined-batch pipeline)."""
    import gzip
    import io as iomod

    rng = np.random.default_rng(53)
    r1, r2 = [], []
    for i in range(150):
        tx = int(rng.integers(0, 50))
        r1.append((f"p{i}", _tx_window(small_transcripts, tx,
                                       int(rng.integers(0, 20)), 60)))
        w2 = _tx_window(small_transcripts, tx, int(rng.integers(0, 20)), 60)
        if i % 5 == 0:
            w2 = w2[::-1]  # unmapped mate
        r2.append((f"p{i}", w2))
    _write_fastq(tmp_path / "p1.fq", r1)
    _write_fastq(tmp_path / "p2.fq", r2)
    for nm in ("p1.fq", "p2.fq"):
        with open(tmp_path / nm, "rb") as f, \
                gzip.open(tmp_path / (nm + ".gz"), "wb") as g:
            g.write(f.read())
    outs = []
    for suffix in ("", ".gz"):
        buf = iomod.BytesIO()
        n = aligner.emit_fastq_paired(str(tmp_path / f"p1.fq{suffix}"),
                                      str(tmp_path / f"p2.fq{suffix}"), buf)
        assert n == 150
        outs.append(buf.getvalue())
    assert outs[0] == outs[1]


def test_directional_umi_dedup():
    from pseudoaligner_tpu.singlecell import CellCounts

    c = CellCounts()
    # one true molecule (high count) + a 1-mismatch error child -> 1 cluster
    pool = {"AAAA": 10, "AAAT": 1}
    assert c.molecule_count(pool, "exact") == 2
    assert c.molecule_count(pool, "directional") == 1
    # counts too similar -> the count rule blocks absorption -> 2 molecules
    pool = {"AAAA": 3, "AAAT": 3}
    assert c.molecule_count(pool, "directional") == 2


def test_directional_umi_chain():
    from pseudoaligner_tpu.singlecell import CellCounts

    c = CellCounts()
    pool = {"AAAA": 10, "AAAT": 5, "AATT": 2}
    # AAAA absorbs AAAT (10 >= 2*5-1=9); AAAT absorbs AATT (5 >= 2*2-1=3)
    assert c.molecule_count(pool, "directional") == 1
    # distant UMI stays its own molecule
    pool["GGGG"] = 1
    assert c.molecule_count(pool, "directional") == 2


def test_knee_cell_calling():
    from pseudoaligner_tpu.singlecell import CellCounts

    c = CellCounts()
    # 5 real cells with ~1000 molecules, 50 ambient with ~2
    rng = np.random.default_rng(0)
    for i in range(5):
        bc = f"CELL{i:012d}"
        for j in range(1000 + int(rng.integers(0, 50))):
            c.add(bc, f"U{j}", [1])
    for i in range(50):
        bc = f"AMBI{i:012d}"
        for j in range(1 + int(rng.integers(0, 3))):
            c.add(bc, f"U{j}", [1])
    called = c.call_cells()
    assert set(called) == {f"CELL{i:012d}" for i in range(5)}


def test_barcode_correction_no_whitelist():
    """Whitelist-free correction: knee-called abundant barcodes absorb
    unique 1-Hamming neighbors (incl. single-N); ambiguous (two called
    candidates) and distant barcodes keep their own cells."""
    from pseudoaligner_tpu.singlecell import CellCounts

    rng = np.random.default_rng(3)
    real = ["AAAAGGGGCCCCTTTT", "CCCCAAAATTTTGGGG", "GGGGTTTTAAAACCCC",
            "TTTTCCCCGGGGAAAA", "AGAGAGAGTCTCTCTC"]
    c = CellCounts()
    for bc in real:
        for j in range(400 + int(rng.integers(0, 40))):
            c.add(bc, f"U{j}", [1])
    # ambient noise so the knee has a tail to cut
    for i in range(30):
        amb = "".join("ACGT"[int(b)] for b in rng.integers(0, 4, 16))
        for j in range(1 + int(rng.integers(0, 2))):
            c.add(amb, f"V{j}", [1])
    err = "T" + real[0][1:]            # 1-Hamming from real[0] only
    c.add(err, "U0", [1])              # shared UMI -> merges on fold
    c.add(err, "W_new", [1])
    nerr = real[1][:7] + "N" + real[1][8:]   # single-N neighbor of real[1]
    c.add(nerr, "W_n", [1])
    # ambiguous: distance 1 from BOTH real[2] and a manufactured called
    twin = "A" + real[2][1:]
    for j in range(420):
        c.add(twin, f"U{j}", [1])
    ambig = "C" + real[2][1:]          # 1 from real[2] AND from twin
    c.add(ambig, "W_a", [1])

    called = c.call_cells()
    assert set(real) | {twin} <= set(called)
    assert err not in called and ambig not in called
    before_cells = len(c.cells)
    folded = c.correct_barcodes()
    assert folded == 2                       # err + nerr fold
    assert len(c.cells) == before_cells - 2
    assert err not in c.cells and nerr not in c.cells
    assert ambig in c.cells                  # ambiguous stays
    ec = c.entry_counts()
    cls0 = c.classes[(1,)]
    # real[0]: ~400+ own UMIs, W_new adds 1, shared U0 dedups away
    assert ec[(c.cells[real[0]], cls0)] >= 401
    assert c.n_corrected == 2


def test_long_read_segmentation(aligner, small_transcripts, tmp_path):
    """A whole transcript streamed as a long read: windows are merged and
    the transcript is in the resulting equivalence class."""
    seqs, _, _ = small_transcripts
    tx = 12
    long_seq = decode_bases(seqs[tx][:500])
    _write_fastq(tmp_path / "long.fq", [("lr0", long_seq), ("short", long_seq[:60])])
    recs = list(aligner.map_fastq(str(tmp_path / "long.fq")))
    assert len(recs) == 2
    assert tx in recs[0].eq_class
    assert recs[0].coverage <= 500
    assert recs[0].coverage >= 400
    assert tx in recs[1].eq_class


def test_segmentation_preserves_short_read_parity(aligner, small_reads, tmp_path):
    """Short reads must be byte-identical through the segmenting reader."""
    reads = small_reads[:80]
    _write_fastq(
        tmp_path / "s.fq", [(rid, decode_bases(c)) for rid, c in reads]
    )
    recs = list(aligner.map_fastq(str(tmp_path / "s.fq")))
    from pseudoaligner_tpu.golden import GoldenAligner

    g = GoldenAligner(aligner.image)
    for (rid, codes), rec in zip(reads, recs):
        r = g.map_read(codes)
        if r is None:
            assert rec.coverage == 0 and rec.eq_class == []
        else:
            eq, cov = r
            assert rec.eq_class == eq, rid
            assert rec.coverage == cov, rid


def test_paired_fast_path_matches_record_path(small_index, small_reads, tmp_path):
    """emit_fastq_paired (signature-indirect native paired emitter) must be
    byte-identical to the map_fastq_paired record path."""
    import io as iomod

    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    r1 = tmp_path / "p1.fq"
    r2 = tmp_path / "p2.fq"
    dec = "ACGT"
    n = 500
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(n):
            a = "".join(dec[b] for b in small_reads[i][1][:60])
            b_ = "".join(dec[b] for b in small_reads[n + i][1][:60])
            f1.write(f"@p{i}\n{a}\n+\n{'I'*len(a)}\n")
            f2.write(f"@p{i}\n{b_}\n+\n{'I'*len(b_)}\n")
    al = Pseudoaligner(small_index, AlignerConfig(
        k=20, batch_size=128, max_read_len=64, max_nodes=9,
        distinct_cap=3, max_walk_iters=4, max_left_iters=2))
    want = "".join(
        rec.format_reference_style() + "\n"
        for rec in al.map_fastq_paired(str(r1), str(r2))
    ).encode()
    buf = iomod.BytesIO()
    n_out = al.emit_fastq_paired(str(r1), str(r2), buf)
    assert n_out == n
    assert buf.getvalue() == want


def test_paired_emit_distinct_cap0_falls_back(small_index, small_reads,
                                              tmp_path):
    """distinct_cap=0 (full debug output) has no compact signatures:
    emit_fastq_paired must take the record-path fallback, not IndexError
    on a zero-width ec_distinct (review r5)."""
    import io as iomod

    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    dec = "ACGT"
    r1 = tmp_path / "z1.fq"
    r2 = tmp_path / "z2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(40):
            a = "".join(dec[b] for b in small_reads[i][1][:60])
            b_ = "".join(dec[b] for b in small_reads[40 + i][1][:60])
            f1.write(f"@p{i}\n{a}\n+\n{'I'*len(a)}\n")
            f2.write(f"@p{i}\n{b_}\n+\n{'I'*len(b_)}\n")
    al = Pseudoaligner(small_index, AlignerConfig(
        k=20, batch_size=32, max_read_len=64, max_nodes=64,
        distinct_cap=0))
    want = "".join(
        rec.format_reference_style() + "\n"
        for rec in al.map_fastq_paired(str(r1), str(r2))
    ).encode()
    buf = iomod.BytesIO()
    n_out = al.emit_fastq_paired(str(r1), str(r2), buf)
    assert n_out == 40
    assert buf.getvalue() == want
    al.close()  # release pools (exercises the new teardown)


def test_paired_batch_count_mismatch_raises(small_index, small_reads, tmp_path):
    """Whole-batch length mismatches must raise, not silently truncate
    (zip-based iteration dropped the longer file's tail)."""
    import io as iomod

    import pytest

    from pseudoaligner_tpu.config import AlignerConfig
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    dec = "ACGT"
    r1 = tmp_path / "m1.fq"
    r2 = tmp_path / "m2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(96):  # 2 batches of 48 vs 1 batch
            a = "".join(dec[b] for b in small_reads[i][1][:60])
            f1.write(f"@p{i}\n{a}\n+\n{'I'*len(a)}\n")
            if i < 48:
                f2.write(f"@p{i}\n{a}\n+\n{'I'*len(a)}\n")
    al = Pseudoaligner(small_index, AlignerConfig(
        k=20, batch_size=48, max_read_len=64, max_nodes=9, distinct_cap=3,
        max_walk_iters=4, max_left_iters=2))
    with pytest.raises(ValueError, match="different read counts"):
        al.emit_fastq_paired(str(r1), str(r2), iomod.BytesIO())
    with pytest.raises(ValueError, match="different read counts"):
        list(al.map_fastq_paired(str(r1), str(r2)))


def test_read_fastq_seqs_rejects_malformed(tmp_path):
    import pytest

    from pseudoaligner_tpu.io.fastq import read_fastq_seqs

    bad = tmp_path / "bad.fq"
    bad.write_text("@r1\nACGT\nACGT\nIIII\n")  # missing '+' line
    with pytest.raises(ValueError, match="malformed"):
        list(read_fastq_seqs(str(bad)))
    trunc = tmp_path / "trunc.fq"
    trunc.write_text("@r1\nACGT\n+\n")  # no qual line
    with pytest.raises(ValueError, match="truncated"):
        list(read_fastq_seqs(str(trunc)))


def test_entry_counts_directional_matches_bruteforce():
    """The vectorized 1-Hamming screen in entry_counts must agree with
    per-pool molecule_count on every pool shape: collision-free pools,
    1-Hamming chains, count-rule blocks, side-interned (string) tokens,
    and singleton pools."""
    from pseudoaligner_tpu.singlecell import CellCounts

    rng = np.random.default_rng(7)
    c = CellCounts()
    # pool 0: chain A->B->C (collisions); pool 1: blocked pair;
    # pool 2: collision-free random 12-mers; pool 3: singleton;
    # pool 4: mixed with an N-containing (side) UMI
    for _ in range(10):
        c.add("BC0", "AAAAAAAAAAAA", [1])
    for _ in range(5):
        c.add("BC0", "AAAAAAAAAAAT", [1])
    for _ in range(2):
        c.add("BC0", "AAAAAAAAAATT", [1])
    for _ in range(3):
        c.add("BC1", "CCCCCCCCCCCC", [2])
        c.add("BC1", "CCCCCCCCCCCG", [2])
    for _ in range(30):
        u = "".join("ACGT"[int(b)] for b in rng.integers(0, 4, 12))
        c.add("BC2", u, [3])
    c.add("BC3", "GGGGGGGGGGGG", [4])
    c.add("BC4", "TTTTTTTTTTTN", [5])
    c.add("BC4", "TTTTTTTTTTTA", [5])
    c.add("BC4", "TTTTTTTTTTTA", [5])

    got = c.entry_counts("directional")
    want = {k: c.molecule_count(pool, "directional")
            for k, pool in c.umis.items()}
    assert got == want
    # and the exact method still counts distinct UMIs
    ex = c.entry_counts("exact")
    assert ex == {k: len(pool) for k, pool in c.umis.items()}


def test_fold_targets_matches_per_barcode_match():
    """The vectorized masked-key fold (_fold_targets, VERDICT r3 #7) must
    reproduce per-barcode wl.match semantics exactly: unique 1-Hamming
    folds, ambiguous drops, single-N folds, >1-N / wrong-length skipped —
    randomized cross-check on a dense barcode space (length 6 so
    collisions and ambiguity are common)."""
    from pseudoaligner_tpu.singlecell import CellCounts, Whitelist, _encode_bc

    rng = np.random.default_rng(11)
    L = 6
    called = sorted({"".join("ACGT"[int(b)] for b in rng.integers(0, 4, L))
                     for _ in range(40)})
    wl = Whitelist(called, L)
    called_set = set(called)

    c = CellCounts()
    pool = []
    for _ in range(600):
        bc = list("".join("ACGT"[int(b)] for b in rng.integers(0, 4, L)))
        r = rng.random()
        if r < 0.25:                       # single N
            bc[int(rng.integers(0, L))] = "N"
        elif r < 0.3:                      # two Ns (never folds)
            bc[0] = "N"; bc[-1] = "N"
        elif r < 0.35:                     # wrong length (never folds)
            bc = bc + ["A"]
        pool.append("".join(bc))
    for bc in pool:
        c.add(bc, "U0", [1])

    got = {cid: w for cid, w in c._fold_targets(wl, called_set)}

    for bc, cid in c.cells.items():
        want = (wl.match(bc.encode())
                if bc not in called_set and len(bc) == L else None)
        if want is not None and want != bc:
            assert cid in got, (bc, want)
            assert wl._decode(int(got[cid])) == want, (bc, want)
        else:
            assert cid not in got, (bc, want, wl._decode(int(got.get(cid, 0))))


def test_fold_targets_scale_smoke():
    """1M raw barcodes fold in seconds (the old per-barcode loop was
    ~minutes at this scale)."""
    import time

    from pseudoaligner_tpu.singlecell import CellCounts, Whitelist

    rng = np.random.default_rng(7)
    L = 16
    codes = rng.integers(0, 1 << 32, size=5000, dtype=np.uint64)
    dec = np.array(list("ACGT"))
    def decode(x):
        return "".join(dec[(int(x) >> (2 * (L - 1 - i))) & 3] for i in range(L))
    called = sorted({decode(x) for x in codes})
    wl = Whitelist(called, L)
    called_set = set(called)

    c = CellCounts()
    n = 1_000_000
    raw_codes = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
    # build the cells dict directly (add() would dominate the timing)
    c.cells = {}
    for i in range(n):
        s = decode(raw_codes[i])
        if s not in c.cells:
            c.cells[s] = len(c.cells)
    t0 = time.time()
    got = list(c._fold_targets(wl, called_set))
    dt = time.time() - t0
    assert dt < 15, f"vectorized fold took {dt:.1f}s for 1M barcodes"
    assert len(got) > 0  # dense space: some folds must exist


def test_whitelist_batched_correction_parity():
    """correct_clean_batch (both the per-row rent phase and the
    neighbor-table buy phase) must reproduce wl.match exactly on clean
    non-member barcodes: unique 1-Hamming corrections, ambiguity drops."""
    from pseudoaligner_tpu.singlecell import Whitelist, _decode_2bit

    rng = np.random.default_rng(21)
    L = 6
    wl_bcs = sorted({"".join("ACGT"[int(b)] for b in rng.integers(0, 4, L))
                     for _ in range(60)})
    q = []
    while len(q) < 300:
        s = "".join("ACGT"[int(b)] for b in rng.integers(0, 4, L))
        if s not in set(wl_bcs):
            q.append(s)
    codes = np.array(
        [sum(("ACGT".index(c)) << (2 * (L - 1 - i)) for i, c in enumerate(s))
         for s in q], np.uint64)

    for force_table in (False, True):
        wl = Whitelist(wl_bcs, L)
        if force_table:
            wl._neighbor_tables()
        got = wl.correct_clean_batch(codes)
        for s, g in zip(q, got):
            want = wl.match(s.encode())
            if want is None:
                assert g == Whitelist._INVALID, (force_table, s)
            else:
                assert _decode_2bit(int(g), L) == want, (force_table, s)


def test_count_native_keys_parity():
    """Direct unit-level differential for pa_count_r1keys (C++) vs a
    numpy oracle of the documented semantics — per-row status, bckey,
    ukey, pkbc, pkumi — across the edge cases the end-to-end fuzz can't
    isolate: 0xFF short rows, dirty-barcode/clean-UMI (pkumi must still
    pack), clean-barcode/dirty-UMI, lowercase (non-ACGT per the count
    LUT), whitelist member/non-member, empty whitelist, no whitelist."""
    from pseudoaligner_tpu.io import native as nat

    rng = np.random.default_rng(99)
    bl, ul = 16, 12
    ml = bl + ul
    n = 4096
    rows = rng.integers(0, 4, size=(n, ml), dtype=np.int64)
    arr = np.frombuffer(b"ACGT", np.uint8)[rows].reshape(n, ml).copy()
    # inject edge cases
    arr[0] = 0xFF                      # short row
    arr[1, 3] = ord("N")               # dirty barcode, clean UMI
    arr[2, bl + 2] = ord("N")          # clean barcode, dirty UMI
    arr[3, 5] = ord("a")               # lowercase = non-ACGT here
    arr[4] = 0xFF
    arr[5, 0] = ord("N")
    arr[6, bl] = ord("n")
    for i in rng.choice(n, 50, replace=False):
        arr[i, rng.integers(0, ml)] = b"Nacgt"[rng.integers(0, 5)]

    lut = np.full(256, 255, np.uint8)
    for j, b in enumerate(b"ACGT"):
        lut[b] = j

    def oracle(wl_sorted):
        codes = lut[arr]
        short = arr[:, 0] == 0xFF
        bad_bc = (codes[:, :bl] == 255).any(axis=1)
        bad_um = (codes[:, bl:] == 255).any(axis=1)
        pk = np.zeros((n, 2), np.uint64)
        for j in range(bl):
            pk[:, 0] = (pk[:, 0] << np.uint64(2)) | np.where(
                codes[:, j] == 255, 0, codes[:, j]).astype(np.uint64)
        for j in range(bl, ml):
            pk[:, 1] = (pk[:, 1] << np.uint64(2)) | np.where(
                codes[:, j] == 255, 0, codes[:, j]).astype(np.uint64)
        pkbc = np.where(bad_bc, 0, pk[:, 0])
        pkumi = np.where(bad_um, 0, pk[:, 1])
        status = np.zeros(n, np.uint8)
        status[bad_bc | bad_um] = 3
        if wl_sorted is not None:
            if len(wl_sorted):
                pos = np.minimum(np.searchsorted(wl_sorted, pkbc),
                                 len(wl_sorted) - 1)
                member = wl_sorted[pos] == pkbc
            else:
                member = np.zeros(n, bool)
            status[(status == 0) & ~member] = 2
        status[short] = 1
        pkbc = np.where(short, 0, pkbc)
        pkumi = np.where(short, 0, pkumi)
        exact = status == 0
        bckey = np.where(exact, pkbc.astype(np.int64), -1)
        ukey = np.where(exact, pkumi.astype(np.int64), -1)
        return bckey, ukey, status, pkbc, pkumi, int(short.sum())

    # whitelist containing ~half the clean barcodes + noise
    codes = lut[arr]
    clean_bc = (codes[:, :bl] != 255).all(axis=1) & (arr[:, 0] != 0xFF)
    some = np.zeros(n, np.uint64)
    for j in range(bl):
        some = (some << np.uint64(2)) | np.where(
            codes[:, j] == 255, 0, codes[:, j]).astype(np.uint64)
    members = np.unique(some[clean_bc])[::2]
    noise = rng.integers(0, 1 << 32, 100).astype(np.uint64)
    wl = np.unique(np.concatenate([members, noise]))

    for wl_sorted in (None, wl, np.empty(0, np.uint64)):
        got = nat.count_r1keys(arr, bl, wl_sorted)
        want = oracle(wl_sorted)
        for gi, wi, name in zip(got, want, ("bckey", "ukey", "status",
                                            "pkbc", "pkumi", "n_short")):
            if name == "n_short":
                assert gi == wi
            else:
                assert np.array_equal(gi, wi), name
