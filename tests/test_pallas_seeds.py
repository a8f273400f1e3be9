"""Pallas fused seed front-end vs the XLA path — bit-identical words and
bucket hashes (interpret mode on CPU; the TPU-compiled check runs through
the worker, see PERF.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pseudoaligner_tpu.dna import kmer_words
from pseudoaligner_tpu.index.cuckoo import H1_SEED, H2_SEED
from pseudoaligner_tpu.ops.hashing import hash_kmer_np
from pseudoaligner_tpu.ops.kmers import all_kmers
from pseudoaligner_tpu.ops.map_kernel import pack_reads_host, unpack_reads
from pseudoaligner_tpu.ops.pallas_seeds import seed_hashes_pallas


@pytest.mark.parametrize("k,L", [(20, 64), (64, 96)])
def test_pallas_seed_front_end_matches_xla(k, L):
    rng = np.random.default_rng(3)
    B = 512
    mask = (1 << 15) - 1
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    packed = pack_reads_host(codes)

    kmers, h1, h2 = seed_hashes_pallas(
        jnp.asarray(packed), k=k, L=L, mask=mask, interpret=True
    )
    kmers = np.asarray(kmers)
    P = L - k + 1
    W = kmer_words(k)
    assert kmers.shape == (B, P, W)

    # XLA reference
    reads = np.asarray(unpack_reads(jnp.asarray(packed), L))
    expect = np.asarray(all_kmers(jnp.asarray(reads), k))
    assert np.array_equal(kmers, expect)

    eh1 = hash_kmer_np(expect.reshape(-1, W), H1_SEED).reshape(B, P) & mask
    eh2 = hash_kmer_np(expect.reshape(-1, W), H2_SEED).reshape(B, P) & mask
    assert np.array_equal(np.asarray(h1), eh1)
    assert np.array_equal(np.asarray(h2), eh2)
