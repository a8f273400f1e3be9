"""BGZF parallel-inflate source (VERDICT r4 #5).

BGZF (gzip members whose FEXTRA carries the 'BC' block-size subfield —
the common real sequencing-data container) inflates members in PARALLEL
on the native source's worker pool (io/native/gzstream.cpp); plain and
non-BGZF multi-member gzip keep the serial streaming path.  These tests
pin byte parity against the Python-fallback inflate, the
deliver-then-error contract on corrupt/truncated members, mid-file
fallback for mixed member types, and end-to-end FastqReader parity.
Reference analog: flate2 MultiGzDecoder (src/utils.rs:46-57).
"""

import gzip
import os

import numpy as np
import pytest

from pseudoaligner_tpu.io.fastq import (
    FastqReader,
    _GzScanBuffer,
    write_bgzf,
)


def _drain(path):
    src = _GzScanBuffer(path)
    try:
        while not src.eof:
            src.fill(src.length + (1 << 20))
        return bytes(src.arr[: src.length].tobytes()), src.err
    finally:
        src.close()


def _recs(n, seq=b"ACGTACGTACGTAAAA"):
    q = b"I" * len(seq)
    return b"".join(b"@r%d\n%s\n+\n%s\n" % (i, seq, q) for i in range(n))


def test_bgzf_native_parity(tmp_path):
    data = _recs(100_000)
    p = str(tmp_path / "a.fq.gz")
    write_bgzf(p, data)
    # sanity: standard gzip readers accept the container
    assert gzip.open(p, "rb").read() == data
    out, err = _drain(p)
    assert err is None and out == data


@pytest.mark.parametrize("member_size", [777, 1 << 12, 1 << 15])
def test_bgzf_member_sizes(tmp_path, member_size):
    data = _recs(20_000)
    p = str(tmp_path / "m.fq.gz")
    write_bgzf(p, data, member_size=member_size)
    out, err = _drain(p)
    assert err is None and out == data


def test_bgzf_empty(tmp_path):
    p = str(tmp_path / "e.fq.gz")
    write_bgzf(p, b"")
    out, err = _drain(p)
    assert err is None and out == b""


def test_bgzf_corrupt_member_delivers_prefix(tmp_path):
    data = _recs(100_000)
    p = str(tmp_path / "c.fq.gz")
    write_bgzf(p, data)
    raw = bytearray(open(p, "rb").read())
    raw[len(raw) // 2] ^= 0xFF  # corrupt a middle member's deflate data
    open(p, "wb").write(bytes(raw))
    out, err = _drain(p)
    assert err is not None  # stashed, deliver-then-error
    assert data.startswith(out) and len(out) > 0


def test_bgzf_truncated_delivers_prefix(tmp_path):
    data = _recs(100_000)
    p = str(tmp_path / "t.fq.gz")
    write_bgzf(p, data)
    raw = open(p, "rb").read()
    for cut in (len(raw) // 3, len(raw) - 5):  # mid-member, mid-trailer
        open(p, "wb").write(raw[:cut])
        out, err = _drain(p)
        assert err is not None, cut
        assert data.startswith(out), cut


def test_bgzf_mixed_members_fall_back_serial(tmp_path):
    """bgzf members, then a plain-gzip member, then bgzf again: the
    producer drains the parallel pipeline and continues serially."""
    data = _recs(50_000)
    p = str(tmp_path / "x.fq.gz")
    write_bgzf(p, data)
    bg = open(p, "rb").read()
    mixed = bg + gzip.compress(data[: len(data) // 2]) + bg
    open(p, "wb").write(mixed)
    want = data + data[: len(data) // 2] + data
    out, err = _drain(p)
    assert err is None and out == want


def test_bgzf_fastq_reader_native_vs_fallback(tmp_path):
    """End-to-end FastqReader over bgzf: native parallel source vs the
    forced Python-fallback inflate produce identical batches."""
    import unittest.mock as mock

    rng = np.random.default_rng(5)
    recs = []
    for i in range(30_000):
        L = int(rng.integers(1, 90))
        seq = bytes(np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, L)])
        recs.append(b"@q%d\n%s\n+\n%s\n" % (i, seq, b"F" * L))
    data = b"".join(recs)
    p = str(tmp_path / "r.fq.gz")
    write_bgzf(p, data, member_size=1 << 13)

    outs = []
    for force_fallback in (False, True):
        ctx = (mock.patch("pseudoaligner_tpu.io.native._load_gz",
                          side_effect=RuntimeError("forced"))
               if force_fallback else mock.patch("os.sep", os.sep))
        with ctx:
            r = FastqReader(p, batch_size=4096, max_len=96)
            got = []
            for b in r:
                got += [(rid, int(b.lens[j]), b.codes[j].tobytes())
                        for j, rid in enumerate(b.ids)]
            r.close()
            outs.append(got)
    assert outs[0] == outs[1]
    assert len(outs[0]) == 30_000


def _member_bounds(raw):
    """(start, end) byte ranges of each BGZF member via the BC BSIZE."""
    import struct
    out = []
    off = 0
    while off < len(raw):
        bsize = struct.unpack_from("<H", raw, off + 16)[0]
        out.append((off, off + bsize + 1))
        off += bsize + 1
    return out


def test_bgzf_lying_isize_rejected_not_fatal(tmp_path):
    """A corrupt trailer ISIZE (untrusted input) must surface as the
    usual stashed gz error — not allocate GBs and std::terminate the
    process from the worker thread (review r5)."""
    import struct

    data = _recs(50_000)
    p = str(tmp_path / "i.fq.gz")
    write_bgzf(p, data)
    raw = bytearray(open(p, "rb").read())
    bounds = _member_bounds(bytes(raw))
    s, e = bounds[1]  # second member: member 0 delivers as the prefix
    struct.pack_into("<I", raw, e - 4, 0xFFFFFFFF)  # ISIZE -> 4GB claim
    open(p, "wb").write(bytes(raw))
    out, err = _drain(p)
    assert err is not None
    assert "BGZF" in str(err) or "gzip" in str(err).lower()
    assert data.startswith(out)


def test_bgzf_overstated_bsize_raises_not_silent_drop(tmp_path):
    """A BSIZE that spans the NEXT member used to inflate member A,
    accept it as clean, and silently discard member B's records (the
    stream then finished with no error).  It must now fail loudly
    (review r5)."""
    import struct

    data = _recs(50_000)
    p = str(tmp_path / "b.fq.gz")
    write_bgzf(p, data)
    raw = bytearray(open(p, "rb").read())
    bounds = _member_bounds(bytes(raw))
    assert len(bounds) >= 4  # need members B and C after the prefix A
    (s1, e1), (s2, e2) = bounds[1], bounds[2]
    new_bsize = (e2 - s1) - 1  # member 1's claim now covers member 2
    assert new_bsize <= 0xFFFF
    struct.pack_into("<H", raw, s1 + 16, new_bsize)
    open(p, "wb").write(bytes(raw))
    out, err = _drain(p)
    assert err is not None  # NOT a silent success missing member 2
    assert data.startswith(out)
