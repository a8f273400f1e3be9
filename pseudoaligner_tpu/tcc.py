"""Transcript-compatibility-count (TCC) aggregation.

The reference prints per-read records only; its README cites TCC
clustering (Ntranos et al., README.md:9-12) as the intended downstream.
This module aggregates a mapping run into the kallisto-style TCC artifact:
an equivalence-class table (`output.ec`: class id -> comma-separated
transcript ids) and a count vector (`output.tsv`: class id -> read count).

Result classes are interned on the fly: a read's intersected class is
often one of the index's interned classes, but intersections across nodes
can create new sets (the reference materializes them per read as Vec<u32>,
src/pseudoaligner.rs:323-356).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class TccCounter:
    classes: dict[tuple[int, ...], int] = field(default_factory=dict)
    counts: list[int] = field(default_factory=list)
    n_reads: int = 0
    n_mapped: int = 0

    def add(self, eq_class: list[int] | tuple[int, ...], mapped: bool = True):
        """Count one read.  Unmapped reads (or empty classes) count toward
        n_reads only."""
        self.n_reads += 1
        if not mapped or not len(eq_class):
            return
        key = tuple(int(x) for x in eq_class)
        idx = self.classes.get(key)
        if idx is None:
            idx = len(self.counts)
            self.classes[key] = idx
            self.counts.append(0)
        self.counts[idx] += 1
        self.n_mapped += 1

    def merge(self, other: "TccCounter"):
        """Merge counts from another counter (e.g. another host's shard)."""
        self.n_reads += other.n_reads
        self.n_mapped += other.n_mapped
        inv = {v: k for k, v in other.classes.items()}
        for idx, c in enumerate(other.counts):
            key = inv[idx]
            j = self.classes.get(key)
            if j is None:
                j = len(self.counts)
                self.classes[key] = j
                self.counts.append(0)
            self.counts[j] += c

    def write(self, outdir: str, prefix: str = "output") -> tuple[str, str]:
        """Write `<prefix>.ec` and `<prefix>.tsv` (kallisto-style)."""
        ec_path = os.path.join(outdir, f"{prefix}.ec")
        tsv_path = os.path.join(outdir, f"{prefix}.tsv")
        inv = {v: k for k, v in self.classes.items()}
        with open(ec_path, "w") as f:
            for i in range(len(self.counts)):
                f.write(f"{i}\t{','.join(map(str, inv[i]))}\n")
        with open(tsv_path, "w") as f:
            for i, c in enumerate(self.counts):
                f.write(f"{i}\t{c}\n")
        return ec_path, tsv_path
