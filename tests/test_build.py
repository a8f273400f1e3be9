"""Index build validation — the port of the reference's `validate_dbg`
exhaustive oracle (reference: src/build_index.rs:262-368): every k-mer's
equivalence class must match a brute-force recomputation, and every
transcript must self-map with full coverage.
"""

import numpy as np
import pytest

from pseudoaligner_tpu.dna import kmer_to_pyint, pack_kmers
from pseudoaligner_tpu.golden import GoldenAligner


def brute_force_eqclasses(seqs, k):
    """Naive per-kmer EC: dict of kmer -> sorted deduped tx list
    (mirror of src/build_index.rs:266-271)."""
    eq = {}
    for i, s in enumerate(seqs):
        for kw in pack_kmers(s, k):
            key = kmer_to_pyint(kw)
            lst = eq.setdefault(key, [])
            if not lst or lst[-1] != i:
                lst.append(i)
    return eq


def _check_kmers_against_brute(img, eq):
    """Per-kmer EC + position check via the MPHF (lookups batched)."""
    from pseudoaligner_tpu.dna import pyint_to_kmer

    keys = list(eq.keys())
    kws = np.stack([pyint_to_kmer(key, img.k) for key in keys])
    slots = img.mphf.lookup(kws)
    assert (slots >= 0).all()
    assert np.array_equal(img.kmer_keys[slots], kws), "slot stores wrong key"
    nodes = img.kmer_node[slots].astype(np.int64)
    offs = img.kmer_offset[slots].astype(np.int64)
    # the graph sequence at (node, offset) spells each kmer
    starts = img.node_start[nodes].astype(np.int64) + offs
    window = starts[:, None] + np.arange(img.k)
    got = img.seq_pool[window]
    # re-pack gathered codes and compare to the queried kmers
    repacked = np.stack([pack_kmers(got[i], img.k)[0] for i in range(len(keys))])
    assert np.array_equal(repacked, kws)
    # EC content matches brute force
    ecs = img.node_ec[nodes]
    for i, key in enumerate(keys):
        got_ec = img.ec_list(int(ecs[i])).tolist()
        assert got_ec == eq[key], (got_ec, eq[key])


def _check_self_mapping(img, seqs):
    """Every transcript maps to itself with full coverage
    (mirror of src/build_index.rs:301-367)."""
    al = GoldenAligner(img)
    for i, s in enumerate(seqs):
        if len(s) < img.k:
            continue
        r = al.map_read(s)
        assert r is not None, f"transcript {i} failed to map"
        eqclass, bases_aligned = r
        assert bases_aligned == len(s), (i, bases_aligned, len(s))
        if len(eqclass) > 1:
            assert i in eqclass
            if len(eqclass) == 2 and np.array_equal(
                seqs[eqclass[0]], seqs[eqclass[1]]
            ):
                continue
            shortest = min(len(seqs[x]) for x in eqclass)
            if len(s) != shortest:
                res = al.map_read_to_nodes_with_mismatch(s, 2)
                my_nodes = set(res[2])
                for j in eqclass:
                    rj = al.map_read_to_nodes_with_mismatch(seqs[j], 2)
                    assert my_nodes.issubset(set(rj[2])), (i, j)
        else:
            assert eqclass == [i]


def test_validate_dbg_small_subset(small_index, small_transcripts):
    seqs, _, _ = small_transcripts
    img = small_index
    eq = brute_force_eqclasses(seqs, img.k)
    assert img.n_kmers == len(eq)
    _check_kmers_against_brute(img, eq)
    _check_self_mapping(img, seqs)


def test_validate_dbg_small_subset_k64(small_transcripts):
    from pseudoaligner_tpu.index.builder import build_index

    seqs, names, gene_map = small_transcripts
    img = build_index(seqs, names, gene_map, k=64)
    eq = brute_force_eqclasses(seqs, img.k)
    assert img.n_kmers == len(eq)
    _check_kmers_against_brute(img, eq)
    _check_self_mapping(img, seqs)


def test_graph_invariants(small_index):
    img = small_index
    # EC ids dense 0..M-1 and referenced by nodes
    assert img.node_ec.max() < img.n_ecs
    # each EC sorted + deduped (mirror of the reference density/dedup
    # assertions, src/equiv_classes.rs:41-49 and src/build_index.rs:286-297)
    for e in range(img.n_ecs):
        lst = img.ec_list(e)
        assert (np.diff(lst.astype(np.int64)) > 0).all()
    # every EC id is used by at least one node? (not guaranteed for interior
    # kmers' classes — classes are interned per kmer, nodes take the head's;
    # all kmers in a node share one EC id by the join rule, so all ids used)
    used = np.unique(img.node_ec)
    assert len(used) == img.n_ecs
    # edge tables are consistent: r_edge targets have the right first kmer
    for n in range(img.n_nodes):
        for b in range(4):
            t = img.r_edge[n, b]
            if t >= 0:
                # target's first k-1 bases == our last k-1 bases, then b
                ours = img.node_seq(n)[-(img.k - 1) :]
                theirs = img.node_seq(t)[: img.k - 1]
                assert np.array_equal(ours, theirs)
                assert img.node_seq(t)[img.k - 1] == b


@pytest.mark.full
def test_validate_dbg_full_k20(full_index, transcripts):
    """Full gencode_small oracle (mirror of src/build_index.rs:394-401),
    vectorized brute-force."""
    seqs, _, _ = transcripts
    img = full_index
    k = img.k

    # vectorized brute force over (kmer, tx) pairs (k=20 -> single u64)
    vals, txs = [], []
    for i, s in enumerate(seqs):
        kw = pack_kmers(s, k)
        if len(kw) == 0:
            continue
        vals.append(kw[:, 0].astype(np.uint64) | (kw[:, 1].astype(np.uint64) << 32))
        txs.append(np.full(len(kw), i, dtype=np.uint64))
    vals = np.concatenate(vals)
    txs = np.concatenate(txs)
    pairs = np.unique(np.stack([vals, txs], axis=1), axis=0)
    uvals, starts = np.unique(pairs[:, 0], return_index=True)
    lens = np.diff(np.append(starts, len(pairs)))

    assert img.n_kmers == len(uvals)

    # probe all kmers through the MPHF
    qwords = np.stack(
        [(uvals & 0xFFFFFFFF).astype(np.uint32), (uvals >> 32).astype(np.uint32)],
        axis=1,
    )
    slots = img.mphf.lookup(qwords)
    assert (slots >= 0).all()
    assert np.array_equal(img.kmer_keys[slots], qwords)
    ec_ids = img.node_ec[img.kmer_node[slots]]

    # EC lengths match
    img_lens = (img.ec_offsets[ec_ids + 1] - img.ec_offsets[ec_ids]).astype(np.int64)
    assert np.array_equal(img_lens, lens)
    # EC contents match
    gather = np.repeat(img.ec_offsets[ec_ids].astype(np.int64), lens) + (
        np.arange(len(pairs)) - np.repeat(starts, lens)
    )
    assert np.array_equal(img.ec_txs[gather].astype(np.uint64), pairs[:, 1])


@pytest.mark.full
def test_self_mapping_full_k20(full_index, transcripts):
    seqs, _, _ = transcripts
    _check_self_mapping(full_index, seqs)


def test_sharded_census_matches_global(small_transcripts):
    """MSP-sharded census (the distributed-build unit) is bit-identical to
    the global census — each shard could equally run on another host."""
    from pseudoaligner_tpu.index.builder import census_numpy, census_sharded

    seqs, _, _ = small_transcripts
    a = census_numpy(seqs, 20)
    b = census_sharded(seqs, 20)
    for f in ("kmer_words", "kmer_exts", "ec_of_kmer", "ec_offsets",
              "ec_txs", "nxt"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f


def test_validate_dbg_random_adversarial():
    """The reference runs validate_dbg only on the bundled fixture
    (src/build_index.rs:394-410); this randomized analog stresses the
    builder on adversarial transcriptome shapes — duplicate transcripts,
    exact-k and sub-k transcripts, isoforms sharing long substrings,
    reversed copies — at both k=20 and k=64."""
    from pseudoaligner_tpu.index.builder import build_index

    rng = np.random.default_rng(2024)
    for trial in range(4):
        k = 20 if trial % 2 == 0 else 64
        base = rng.integers(
            0, 4, size=int(rng.integers(max(200, 3 * k), 800))
        ).astype(np.uint8)
        seqs = []
        for _ in range(int(rng.integers(2, 5))):  # overlapping isoforms
            a = int(rng.integers(0, len(base) - k))
            b = int(rng.integers(a + k, len(base) + 1))
            seqs.append(base[a:b].copy())
        seqs.append(seqs[0].copy())  # exact duplicate
        seqs.append(rng.integers(0, 4, size=k).astype(np.uint8))  # len==k
        seqs.append(  # len k-1: contributes no k-mers, never maps
            rng.integers(0, 4, size=k - 1).astype(np.uint8))
        seqs.append(seqs[1][::-1].copy())  # reversed (not complemented)
        for _ in range(int(rng.integers(3, 8))):
            seqs.append(rng.integers(
                0, 4, size=int(rng.integers(k, 3 * k))).astype(np.uint8))
        names = [f"t{i}" for i in range(len(seqs))]
        gene_map = {n: f"g{i // 2}" for i, n in enumerate(names)}
        img = build_index(seqs, names, gene_map, k=k)
        eq = brute_force_eqclasses(seqs, k)
        assert img.n_kmers == len(eq), trial
        _check_kmers_against_brute(img, eq)
        _check_self_mapping(img, seqs)
