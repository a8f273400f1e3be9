"""Native (C++) cuckoo-table build vs the NumPy builder.

The cuckoo probe is placement-invariant — a present key matches in exactly
one slot of its two candidate buckets, an absent key in none — so the two
builders need not agree on slot assignment, only on lookup results
(reference analogy: the MPHF's slot numbering is likewise an internal
detail; only get() results matter, src/pseudoaligner.rs:96 [dep]).
"""

import numpy as np
import pytest

from pseudoaligner_tpu.index.cuckoo import (
    EMPTY,
    SLOTS,
    build_cuckoo,
    build_cuckoo_fast,
    cuckoo_lookup_np,
)


def _random_keys(n, w, seed=0):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**32, size=(n * 2, w), dtype=np.uint64).astype(np.uint32)
    keys = np.unique(keys, axis=0)[:n]
    return keys


@pytest.mark.parametrize("n,w", [(10, 2), (5000, 2), (200000, 2), (5000, 4)])
def test_native_matches_numpy_lookups(n, w):
    keys = _random_keys(n, w)
    n = len(keys)
    nodes = np.arange(n, dtype=np.uint32) * 3
    offs = np.arange(n, dtype=np.uint32) % 97

    ci_np = build_cuckoo(keys, nodes, offs)
    ci_cc = build_cuckoo_fast(keys, nodes, offs)
    assert ci_cc.W == w

    # every inserted key resolves to its exact (node, offset) in both
    for ci in (ci_np, ci_cc):
        node, off = cuckoo_lookup_np(ci, keys)
        assert np.array_equal(node, nodes.astype(np.int64))
        assert np.array_equal(off, offs.astype(np.int64))

    # alien keys miss in both
    alien = _random_keys(n, w, seed=1)
    present = set(map(tuple, keys.tolist()))
    alien = np.array(
        [q for q in alien.tolist() if tuple(q) not in present], dtype=np.uint32
    ).reshape(-1, w)
    node, off = cuckoo_lookup_np(ci_cc, alien)
    assert (node == -1).all() and (off == -1).all()


def test_native_build_deterministic():
    keys = _random_keys(50000, 2, seed=7)
    nodes = np.arange(len(keys), dtype=np.uint32)
    offs = np.zeros(len(keys), dtype=np.uint32)
    a = build_cuckoo_fast(keys, nodes, offs)
    b = build_cuckoo_fast(keys, nodes, offs)
    assert np.array_equal(a.buckets, b.buckets)
    assert a.mask == b.mask


def test_native_empty_slots_sentinel():
    keys = _random_keys(100, 2)
    nodes = np.arange(len(keys), dtype=np.uint32)
    offs = np.zeros(len(keys), dtype=np.uint32)
    ci = build_cuckoo_fast(keys, nodes, offs)
    rows = ci.buckets.reshape(ci.n_buckets, SLOTS, ci.W + 2)
    filled = rows[:, :, ci.W] != EMPTY
    assert filled.sum() == len(keys)
    # empty slots are fully zeroed apart from the sentinel
    assert (rows[~filled][:, : ci.W] == 0).all()
    assert (rows[~filled][:, ci.W + 1] == 0).all()
