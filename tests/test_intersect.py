"""Property tests for sorted-set intersection (mirror of the reference's
proptest suite, src/pseudoaligner.rs:526-586)."""

import numpy as np

from pseudoaligner_tpu.golden import intersect

HAND_VECTORS = [
    [1, 2, 3, 4, 5, 6, 7, 8, 9],
    [1, 2, 3],
    [1, 4, 5],
    [7, 8, 9],
    [9],
    [],
    [1, 2, 3, 6, 7, 8, 9],
    [1, 7, 8, 9, 10],
    [10, 15, 20],
    [21, 22, 23],
    [0],
    [0, 1000, 5000],
    [0, 1000, 1000001],
    [5],
    [100000000],
    [1, 23, 45, 1000001, 100000000],
]


def check(v1, v2):
    expect = sorted(set(v1) & set(v2))
    assert intersect(list(v1), list(v2)) == expect


def test_intersect_hand_vectors_all_pairs():
    for v1 in HAND_VECTORS:
        for v2 in HAND_VECTORS:
            check(v1, v2)
            check(v2, v1)


def test_intersect_property_random():
    rng = np.random.default_rng(42)
    for _ in range(1000):
        n1, n2 = rng.integers(0, 200, size=2)
        v1 = sorted(set(rng.integers(0, 100, size=n1).tolist()))
        v2 = sorted(set(rng.integers(0, 100, size=n2).tolist()))
        check(v1, v2)
        check(v2, v1)
