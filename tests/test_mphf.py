import numpy as np
import pytest

from pseudoaligner_tpu.index.mphf import build_mphf
from pseudoaligner_tpu.dna import pack_kmers


def _random_keys(n, w, seed=0):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**32, size=(n * 2, w), dtype=np.uint64).astype(np.uint32)
    keys = np.unique(keys, axis=0)[:n]
    return keys


@pytest.mark.parametrize("n,w", [(10, 2), (1000, 2), (50000, 2), (5000, 4)])
def test_mphf_is_minimal_perfect(n, w):
    keys = _random_keys(n, w)
    n = len(keys)
    mphf, slot_of_key = build_mphf(keys)
    assert mphf.n_keys == n
    # bijection onto 0..n-1
    assert np.array_equal(np.sort(slot_of_key), np.arange(n))
    # lookup agrees with build-time assignment
    got = mphf.lookup(keys)
    assert np.array_equal(got, slot_of_key)


def test_mphf_alien_keys_verifiable(small_index):
    """Alien probes may false-positive, but stored keys always disambiguate."""
    img = small_index
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=5000 + img.k - 1).astype(np.uint8)
    queries = pack_kmers(codes, img.k)
    slots = img.mphf.lookup(queries)
    in_range = slots >= 0
    # wherever a slot is returned, stored-key comparison decides truth
    verified = np.zeros(len(queries), dtype=bool)
    vr = np.all(img.kmer_keys[slots[in_range]] == queries[in_range], axis=1)
    verified[in_range] = vr
    # ground truth via python set
    truth = set(map(tuple, img.kmer_keys.tolist()))
    expect = np.array([tuple(q) in truth for q in queries.tolist()])
    assert np.array_equal(verified, expect)


def test_mphf_lookup_real_keys_all_found(small_index):
    img = small_index
    slots = img.mphf.lookup(img.kmer_keys)
    assert np.array_equal(np.sort(slots), np.arange(img.n_kmers))
    assert np.array_equal(slots, np.arange(img.n_kmers))
