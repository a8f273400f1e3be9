"""Randomized fuzz for the ANALYSIS surfaces (VERDICT r4 #6).

The randomized adversarial-graph generator (duplicates, isoform
overlaps, exact-k / sub-k transcripts, reversed copies, k=20/64) has
caught a real bug every round it was extended — this points it at
mappability / idxstats / inspect, whose parity was previously
fixture-only.  Oracles are PER-KMER brute-force recomputations
(independent of the graph/EC machinery), mirroring
/root/reference/src/mappability.rs:33-106 semantics.
"""

import contextlib
import io
import os

import numpy as np

from pseudoaligner_tpu.config import MAPPABILITY_COUNTS_LEN
from pseudoaligner_tpu.index.builder import build_index
from pseudoaligner_tpu.mappability import (
    rust_f64_str,
    write_mappability_tsv,
)

from .test_build import brute_force_eqclasses


def _adversarial_case(rng, k):
    base = rng.integers(
        0, 4, size=int(rng.integers(max(200, 3 * k), 800))
    ).astype(np.uint8)
    seqs = []
    for _ in range(int(rng.integers(2, 5))):  # overlapping isoforms
        a = int(rng.integers(0, len(base) - k))
        b = int(rng.integers(a + k, len(base) + 1))
        seqs.append(base[a:b].copy())
    seqs.append(seqs[0].copy())  # exact duplicate
    seqs.append(rng.integers(0, 4, size=k).astype(np.uint8))  # len == k
    seqs.append(  # len k-1: contributes no k-mers
        rng.integers(0, 4, size=k - 1).astype(np.uint8))
    seqs.append(seqs[1][::-1].copy())
    for _ in range(int(rng.integers(3, 8))):
        seqs.append(rng.integers(
            0, 4, size=int(rng.integers(k, 3 * k))).astype(np.uint8))
    names = [f"t{i}" for i in range(len(seqs))]
    # several transcripts per gene -> non-trivial gene multiplicities
    gene_map = {n: f"g{i // 2}" for i, n in enumerate(names)}
    return seqs, names, gene_map


def _brute_mappability(eq, names, gene_map, n_tx):
    """Per-kmer oracle: each distinct k-mer contributes 1 to each member
    transcript's tx-multiplicity bin (|EC|) and gene-multiplicity bin
    (# distinct genes in its EC) — src/mappability.rs:120-156 without
    going through nodes at all."""
    LEN = MAPPABILITY_COUNTS_LEN

    def _bin(m):
        return LEN - 1 if m > LEN else m - 1

    tx_mult = np.zeros((n_tx, LEN), np.int64)
    gene_mult = np.zeros((n_tx, LEN), np.int64)
    for txs in eq.values():
        genes = {gene_map[names[t]] for t in txs}
        bt, bg = _bin(len(txs)), _bin(len(genes))
        for t in txs:
            tx_mult[t, bt] += 1
            gene_mult[t, bg] += 1
    return tx_mult, gene_mult


def _cli(argv):
    from pseudoaligner_tpu import cli

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(argv)
    assert rc == 0
    return buf.getvalue()


def test_analysis_surfaces_random_adversarial(tmp_path):
    from pseudoaligner_tpu.mappability import analyze_graph
    from pseudoaligner_tpu.serde import save_index

    rng = np.random.default_rng(777)
    for trial in range(4):
        k = 20 if trial % 2 == 0 else 64
        seqs, names, gene_map = _adversarial_case(rng, k)
        img = build_index(seqs, names, gene_map, k=k)
        eq = brute_force_eqclasses(seqs, k)

        # --- mappability: vectorized analyze_graph vs per-kmer brute
        tx_b, gene_b = _brute_mappability(eq, names, gene_map, len(seqs))
        tx_v, gene_v = analyze_graph(img)
        assert np.array_equal(tx_v, tx_b), trial
        assert np.array_equal(gene_v, gene_b), trial

        # --- TSV: byte-level recomputation from the brute oracle
        outdir = str(tmp_path / f"m{trial}")
        os.makedirs(outdir, exist_ok=True)
        p = write_mappability_tsv(img, outdir)
        lines = open(p).read().splitlines()
        total = tx_b.sum(axis=1)
        assert len(lines) == 1 + len(seqs)
        for i, name in enumerate(names):
            ft = tx_b[i, 0] / total[i] if total[i] else float("nan")
            fg = gene_b[i, 0] / total[i] if total[i] else float("nan")
            want = (f"{name}\t{gene_map[name]}\t{total[i]}\t"
                    f"{rust_f64_str(ft)}\t{rust_f64_str(fg)}")
            assert lines[1 + i] == want, (trial, i)

        # --- idxstats (CLI): per-node len + EC size vs brute
        idx_path = str(tmp_path / f"i{trial}.bin")
        save_index(img, idx_path)
        out = _cli(["idxstats", "-i", idx_path])
        rows = [ln.split("\t") for ln in out.splitlines()]
        assert len(rows) == img.n_nodes
        total_kmers = 0
        from pseudoaligner_tpu.dna import kmer_to_pyint, pack_kmers

        for n, (nid, nlen, ecsz) in enumerate(rows):
            assert int(nid) == n
            nlen, ecsz = int(nlen), int(ecsz)
            assert nlen == int(img.node_len[n])
            total_kmers += nlen - k + 1
            # the node's first k-mer must carry an EC of exactly ecsz
            start = int(img.node_start[n])
            kw = pack_kmers(img.seq_pool[start: start + k], k)[0]
            assert len(eq[kmer_to_pyint(kw)]) == ecsz, (trial, n)
        assert total_kmers == len(eq), trial

        # --- inspect (CLI): recomputable stats
        out = _cli(["inspect", "-i", idx_path])
        st = dict(ln.split("\t") for ln in out.splitlines())
        assert int(st["n_kmers"]) == len(eq)
        assert int(st["n_tx"]) == len(seqs)
        assert int(st["k"]) == k
        assert int(st["n_nodes"]) == img.n_nodes
