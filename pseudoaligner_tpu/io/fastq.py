"""FASTQ streaming input pipeline.

Host input stage feeding fixed-shape read batches to the device mapping
engine.  Replaces the reference's mutexed shared record iterator + worker
threads (reference: src/pseudoaligner.rs:420-474, src/utils.rs:152-157)
with a batch reader: the TPU data-parallel axis replaces the thread pool.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import IO, Iterator

import numpy as np

from ..dna import _ENCODE_LUT


def _open(path: str) -> IO[bytes]:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


@dataclass
class ReadBatch:
    """A fixed-shape batch of reads.

    codes: [B, L] uint8 base codes, padded with 0 beyond each read's length
    lens:  [B] int32 read lengths (0 for padding rows)
    ids:   list of read names (len == number of real reads <= B)
    group: [n_reads] int32 — source-read index; rows sharing a value are
           overlapping windows of one long read (see segment_long)
    offset: [n_reads] int32 — window start within the source read
    """

    codes: np.ndarray
    lens: np.ndarray
    ids: list[str]
    group: np.ndarray | None = None
    offset: np.ndarray | None = None

    @property
    def n_reads(self) -> int:
        return len(self.ids)


def read_fastq_records(path: str) -> Iterator[tuple[str, bytes]]:
    """Yield (read_id, seq_bytes) from a (possibly gzipped) FASTQ file."""
    with _open(path) as f:
        while True:
            header = f.readline()
            if not header:
                return
            seq = f.readline().rstrip(b"\r\n")
            plus = f.readline()
            qual = f.readline()
            if not qual:
                raise ValueError("truncated FASTQ record")
            if not header.startswith(b"@") or not plus.startswith(b"+"):
                raise ValueError("malformed FASTQ record")
            rid = header[1:].rstrip(b"\r\n").split(b" ", 1)[0].decode()
            yield rid, seq


class FastqReader:
    """Batching FASTQ reader producing fixed-shape ReadBatch objects.

    Reads longer than `max_len` are split into overlapping windows
    (overlap `window_overlap`, typically k-1, so every k-mer appears in
    some window) when `segment_long=True` — the long-read segmentation
    path (SURVEY.md section 5.7; the reference handles arbitrary length in
    a scalar loop).  Windows of one read share a `group` value and are
    merged downstream.  With `segment_long=False`, long reads raise.
    """

    def __init__(
        self,
        path: str,
        batch_size: int,
        max_len: int,
        segment_long: bool = False,
        window_overlap: int = 19,
    ):
        self._records = read_fastq_records(path)
        self.batch_size = batch_size
        self.max_len = max_len
        self.segment_long = segment_long
        self.window_overlap = window_overlap
        self._read_index = 0
        self._pending: list[tuple[str, np.ndarray, int]] = []

    def __iter__(self) -> Iterator[ReadBatch]:
        while True:
            batch = self._next_batch()
            if batch is None:
                return
            yield batch

    def _rows_for(self, rid: str, seq: bytes) -> list[tuple[str, np.ndarray, int]]:
        raw = np.frombuffer(seq, dtype=np.uint8)
        enc = _ENCODE_LUT[raw]
        # Non-ACGT bases in reads: `DnaString::from_dna_string` maps
        # unknown ASCII to code 0 ('A') (reference call site:
        # src/pseudoaligner.rs:450 [dep]).
        enc = np.where(enc == 255, 0, enc).astype(np.uint8)
        g = self._read_index
        self._read_index += 1
        L = self.max_len
        if len(enc) <= L:
            return [(rid, enc, g, 0)]
        if not self.segment_long:
            raise ValueError(
                f"read {rid!r} length {len(seq)} exceeds max_read_len={L} "
                "(enable segment_long)"
            )
        stride = L - self.window_overlap
        rows = []
        p = 0
        while True:
            rows.append((rid, enc[p : p + L], g, p))
            if p + L >= len(enc):
                break
            p = min(p + stride, len(enc) - L)
        return rows

    def _next_batch(self) -> ReadBatch | None:
        b, L = self.batch_size, self.max_len
        codes = np.zeros((b, L), dtype=np.uint8)
        lens = np.zeros(b, dtype=np.int32)
        ids: list[str] = []
        group: list[int] = []
        offset: list[int] = []

        def put(row):
            i = len(ids)
            rid, enc, g, off = row
            codes[i, : len(enc)] = enc
            lens[i] = len(enc)
            ids.append(rid)
            group.append(g)
            offset.append(off)

        while len(ids) < b and self._pending:
            put(self._pending.pop(0))
        while len(ids) < b:
            try:
                rid, seq = next(self._records)
            except StopIteration:
                break
            rows = self._rows_for(rid, seq)
            # keep all windows of one read in the same batch when possible
            if len(rows) > b - len(ids):
                self._pending.extend(rows)
                while len(ids) < b and self._pending:
                    put(self._pending.pop(0))
            else:
                for r in rows:
                    put(r)
        if not ids:
            return None
        return ReadBatch(
            codes=codes,
            lens=lens,
            ids=ids,
            group=np.asarray(group, dtype=np.int32),
            offset=np.asarray(offset, dtype=np.int32),
        )
