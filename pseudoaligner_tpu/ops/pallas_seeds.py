"""Pallas TPU kernel: fused read-unpack + k-mer packing + bucket hashing.

The seed phase's dense front end — 2-bit read words -> every position's
k-mer words plus both cuckoo bucket hashes — as ONE VMEM-resident Pallas
kernel.  XLA runs the same math as ~k+14 separate HLO ops with [B, P]
intermediates bouncing through HBM; the kernel keeps everything in VMEM
and writes only the outputs.  (The gathers that consume these outputs
stay in XLA: Mosaic has no big-table gather — see PERF.md.)

All ops are VPU-friendly uint32 shift/mult/xor; the grid tiles the batch
dimension.  Enabled via AlignerConfig.use_pallas_seeds; validated
bit-identical to the XLA path in tests (interpret mode on CPU, compiled
on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dna import kmer_words
from ..index.cuckoo import H1_SEED, H2_SEED


def _mix32(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _kernel(packed_ref, kmers_ref, h1_ref, h2_ref, *, k, L, P, W, mask):
    packed = packed_ref[:]  # [TB, RW] uint32
    TB = packed.shape[0]

    # unpack 2-bit codes: codes[:, i] = (packed[:, i//16] >> 2*(i%16)) & 3
    cols = []
    for i in range(L):
        w, s = i // 16, 2 * (i % 16)
        cols.append((packed[:, w] >> jnp.uint32(s)) & jnp.uint32(3))
    codes = jnp.stack(cols, axis=1)  # [TB, L] uint32

    # k-mer words, little-endian layout as in dna.pack_kmers
    words = [jnp.zeros((TB, P), jnp.uint32) for _ in range(W)]
    for i in range(k):
        bitpos = 2 * (k - 1 - i)
        w, shift = bitpos // 32, bitpos % 32
        words[w] = words[w] | (codes[:, i : i + P] << jnp.uint32(shift))

    for w in range(W):
        kmers_ref[:, :, w] = words[w]

    # bucket hashes (ops/hashing.py spec: fmix32 chain over words)
    for seed, out in ((H1_SEED, h1_ref), (H2_SEED, h2_ref)):
        h = jnp.full((TB, P), jnp.uint32(seed), jnp.uint32)
        for w in range(W):
            h = _mix32(h ^ words[w])
        out[:] = h & jnp.uint32(mask)


@functools.partial(jax.jit, static_argnames=("k", "L", "mask", "interpret"))
def seed_hashes_pallas(packed, k: int, L: int, mask: int, interpret: bool = False):
    """[B, RW] packed reads -> (kmers [B, P, W] u32, h1 [B, P], h2 [B, P]).

    h1/h2 are cuckoo bucket indices (already masked)."""
    B, RW = packed.shape
    P = L - k + 1
    W = kmer_words(k)
    TB = min(B, 256)
    assert B % TB == 0, "batch must divide the pallas tile"
    kern = functools.partial(_kernel, k=k, L=L, P=P, W=W, mask=mask)
    return pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, RW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, P, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P, W), jnp.uint32),
            jax.ShapeDtypeStruct((B, P), jnp.uint32),
            jax.ShapeDtypeStruct((B, P), jnp.uint32),
        ),
        interpret=interpret,
    )(packed)
