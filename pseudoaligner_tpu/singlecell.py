"""Single-cell 10x stream: barcode/UMI-tagged reads -> per-cell TCC matrix.

BASELINE config 4 (alevin-style; Srivastava et al., cited at the
reference's README.md:13-15).  R1 carries cell barcode + UMI, R2 the cDNA
fragment.  R2 is pseudoaligned on device; per (cell, equivalence-class)
molecule counts are UMI-deduplicated.  The reference repo has no
single-cell pipeline (it is the pseudoalignment core such a pipeline would
sit on); this module is the TPU-native realization of that workload.

Output: a Matrix-Market-style sparse matrix (cells x equivalence classes,
distinct-UMI counts) plus barcodes.tsv and the EC definition table.
Barcode whitelisting/correction is intentionally out of scope for now
(exact barcodes only).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .io.fastq import read_fastq_records
from .models.aligner import Pseudoaligner


@dataclass
class Chemistry:
    bc_len: int = 16
    umi_len: int = 12  # 10x v3; v2 uses 10

    @property
    def r1_min_len(self) -> int:
        return self.bc_len + self.umi_len


@dataclass
class CellCounts:
    """Per-cell, per-EC distinct-UMI accumulation."""

    classes: dict[tuple[int, ...], int] = field(default_factory=dict)
    # (cell_index, class_index) -> set of UMI strings
    cells: dict[str, int] = field(default_factory=dict)
    umis: dict[tuple[int, int], set] = field(default_factory=dict)
    n_reads: int = 0
    n_mapped: int = 0
    n_bad_r1: int = 0

    def _class_id(self, eq: tuple[int, ...]) -> int:
        idx = self.classes.get(eq)
        if idx is None:
            idx = len(self.classes)
            self.classes[eq] = idx
        return idx

    def _cell_id(self, bc: str) -> int:
        idx = self.cells.get(bc)
        if idx is None:
            idx = len(self.cells)
            self.cells[bc] = idx
        return idx

    def add(self, bc: str, umi: str, eq_class):
        self.n_reads += 1
        if not len(eq_class):
            return
        self.n_mapped += 1
        key = (self._cell_id(bc), self._class_id(tuple(int(x) for x in eq_class)))
        self.umis.setdefault(key, set()).add(umi)

    def write(self, outdir: str) -> None:
        os.makedirs(outdir, exist_ok=True)
        inv_cells = {v: k for k, v in self.cells.items()}
        with open(os.path.join(outdir, "barcodes.tsv"), "w") as f:
            for i in range(len(self.cells)):
                f.write(inv_cells[i] + "\n")
        inv_classes = {v: k for k, v in self.classes.items()}
        with open(os.path.join(outdir, "ec.tsv"), "w") as f:
            for i in range(len(self.classes)):
                f.write(f"{i}\t{','.join(map(str, inv_classes[i]))}\n")
        entries = sorted(
            (cell, cls, len(u)) for (cell, cls), u in self.umis.items()
        )
        with open(os.path.join(outdir, "matrix.mtx"), "w") as f:
            f.write("%%MatrixMarket matrix coordinate integer general\n")
            f.write(f"%\n{len(self.cells)} {len(self.classes)} {len(entries)}\n")
            for cell, cls, n in entries:
                f.write(f"{cell + 1} {cls + 1} {n}\n")


def count_single_cell(
    aligner: Pseudoaligner,
    r1_path: str,
    r2_path: str,
    chem: Chemistry | None = None,
) -> CellCounts:
    """Run the 10x counting pipeline.  R1: barcode+UMI; R2: cDNA."""
    chem = chem or Chemistry()
    counts = CellCounts()

    r1 = read_fastq_records(r1_path)
    from .io.fastq import FastqReader

    r2 = FastqReader(
        r2_path, aligner.config.batch_size, aligner.config.max_read_len
    )
    import jax

    for batch in r2:
        res = aligner.records_from_result(
            jax.device_get(aligner.map_batch_device(batch.codes, batch.lens)),
            batch,
        )
        for rec in res:
            try:
                _, seq1 = next(r1)
            except StopIteration:
                raise ValueError("R1 has fewer reads than R2")
            if len(seq1) < chem.r1_min_len:
                counts.n_bad_r1 += 1
                counts.n_reads += 1
                continue
            bc = seq1[: chem.bc_len].decode()
            umi = seq1[chem.bc_len : chem.bc_len + chem.umi_len].decode()
            counts.add(bc, umi, rec.eq_class if rec.coverage else ())
    return counts
