import numpy as np

from pseudoaligner_tpu.config import MAPPABILITY_COUNTS_LEN
from pseudoaligner_tpu.mappability import (
    analyze_graph,
    rust_f64_str,
    write_mappability_tsv,
)


def reference_style_analyze(image):
    """Scalar mirror of src/mappability.rs:120-156 as the oracle."""
    T = image.n_tx
    LEN = MAPPABILITY_COUNTS_LEN
    tx_mult = np.zeros((T, LEN), dtype=np.int64)
    gene_mult = np.zeros((T, LEN), dtype=np.int64)

    def add(arr, tx, count, multiplicity):
        if multiplicity > LEN:
            arr[tx, LEN - 1] += count
        else:
            arr[tx, multiplicity - 1] += count

    for n in range(image.n_nodes):
        num_kmer = int(image.node_len[n]) - image.k + 1
        ec = image.ec_list(int(image.node_ec[n]))
        num_tx = len(ec)
        genes = []
        for t in ec:
            g = image.tx_gene_mapping[image.tx_names[int(t)]]
            if g not in genes:
                genes.append(g)
        num_genes = len(genes)
        for t in ec:
            add(tx_mult, int(t), num_kmer, num_tx)
            add(gene_mult, int(t), num_kmer, num_genes)
    return tx_mult, gene_mult


def test_analyze_graph_matches_scalar_oracle(small_index):
    tx_v, gene_v = analyze_graph(small_index)
    tx_s, gene_s = reference_style_analyze(small_index)
    assert np.array_equal(tx_v, tx_s)
    assert np.array_equal(gene_v, gene_s)


def test_write_tsv(small_index, tmp_path):
    p = write_mappability_tsv(small_index, str(tmp_path))
    lines = open(p).read().splitlines()
    assert lines[0] == (
        "tx_name\tgene_name\ttx_kmer_count\tfrac_kmer_unique_tx\tfrac_kmer_unique_gene"
    )
    assert len(lines) == 1 + small_index.n_tx
    row = lines[1].split("\t")
    assert row[0] == small_index.tx_names[0]
    float(row[3])  # parses


def test_rust_f64_formatting():
    assert rust_f64_str(1.0) == "1"
    assert rust_f64_str(0.5) == "0.5"
    assert rust_f64_str(float("nan")) == "NaN"
    assert rust_f64_str(1 / 3) == "0.3333333333333333"
    assert rust_f64_str(5e-05) == "0.00005"
    assert rust_f64_str(1.5e-7) == "0.00000015"
    assert rust_f64_str(0.0) == "0"
