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
    """

    codes: np.ndarray
    lens: np.ndarray
    ids: list[str]

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

    Reads longer than `max_len` are rejected with an error for now (the
    long-read segmentation path unions node sets across windows; see
    SURVEY.md section 5.7) — the reference handles arbitrary length in a
    scalar loop, typical RNA-seq reads are 60-150bp.
    """

    def __init__(self, path: str, batch_size: int, max_len: int):
        self._records = read_fastq_records(path)
        self.batch_size = batch_size
        self.max_len = max_len

    def __iter__(self) -> Iterator[ReadBatch]:
        while True:
            batch = self._next_batch()
            if batch is None:
                return
            yield batch

    def _next_batch(self) -> ReadBatch | None:
        b, L = self.batch_size, self.max_len
        codes = np.zeros((b, L), dtype=np.uint8)
        lens = np.zeros(b, dtype=np.int32)
        ids: list[str] = []
        for i, (rid, seq) in zip(range(b), self._records):
            if len(seq) > L:
                raise ValueError(
                    f"read {rid!r} length {len(seq)} exceeds max_read_len={L}"
                )
            raw = np.frombuffer(seq, dtype=np.uint8)
            enc = _ENCODE_LUT[raw]
            # Non-ACGT bases in reads: `DnaString::from_dna_string` maps
            # unknown ASCII to code 0 ('A') (reference call site:
            # src/pseudoaligner.rs:450 [dep]).
            enc = np.where(enc == 255, 0, enc)
            codes[i, : len(seq)] = enc
            lens[i] = len(seq)
            ids.append(rid)
        if not ids:
            return None
        return ReadBatch(codes=codes, lens=lens, ids=ids)
