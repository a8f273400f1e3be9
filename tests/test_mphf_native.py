"""Native (C++) MPHF build vs the NumPy builder — must be bit-identical.

Unlike the cuckoo table, the MPHF level structure is serialized into the
index image, so the native build must reproduce the NumPy arrays exactly
(both implement the same deterministic level-assignment; reference analog:
boomphf::Mphf construction, src/build_index.rs:195-197 [dep]).
"""

import numpy as np
import pytest

from pseudoaligner_tpu.index.mphf import build_mphf


def _random_keys(n, w, seed=0):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**32, size=(n * 2, w), dtype=np.uint64).astype(np.uint32)
    keys = np.unique(keys, axis=0)[:n]
    return keys


@pytest.mark.parametrize("n,w", [(10, 2), (1000, 2), (200000, 2), (5000, 4)])
def test_native_bit_identical_to_numpy(n, w):
    keys = _random_keys(n, w)
    m_cc, slots_cc = build_mphf(keys, native=True)
    m_np, slots_np = build_mphf(keys, native=False)
    assert np.array_equal(slots_cc, slots_np)
    for f in ("seeds", "masks", "word_offsets", "key_offsets", "bits", "ranks"):
        assert np.array_equal(getattr(m_cc, f), getattr(m_np, f)), f
    assert m_cc.n_keys == m_np.n_keys
    # and it is a valid MPHF: lookup of every key returns its slot
    assert np.array_equal(m_cc.lookup(keys), slots_cc)
    assert np.array_equal(np.sort(slots_cc), np.arange(len(keys)))
