"""The batched read-mapping engine — the framework's hot path.

TPU-native re-design of `map_read_to_nodes_with_mismatch` + EC intersection
(reference: src/pseudoaligner.rs:64-356).  The reference maps one read per
thread with scalar loops; here a whole [B, L] batch advances in lockstep:

- every read position's k-mer is packed and MPHF-probed **up front** as one
  [B, P] vector op (ops/kmers.py + ops/mphf_lookup.py), turning the
  stride-3 seed scan and every later re-seed (src/pseudoaligner.rs:91-114,
  287-299) into a table lookup: per mod-3 residue class, a reverse cummin
  yields `next_hit[p]` = the first verified seed at or after p in p's
  stride class;
- the base-by-base comparison loops (src/pseudoaligner.rs:151-170,236-255)
  become masked L-wide vector window compares: one cumulative-sum over the
  mismatch mask reproduces the per-segment SNP budget exactly (the base
  that exceeds the budget counts toward mismatches but not coverage);
- the irregular graph walk keeps its data-dependent control flow as two
  `lax.while_loop`s (left extension, then forward walk) over per-lane
  state, masked per lane; XLA batches the graph gathers across lanes;
- the EC intersection (src/pseudoaligner.rs:323-356,389-418) becomes an
  AND-reduction over per-class transcript bitsets for small transcriptomes
  (bit t of word w = transcript 32w+t), with a host CSR-merge fallback for
  large ones.

Semantics are bit-identical to the golden oracle (tests/test_map_device.py
checks every read of the bundled FASTQ).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlignerConfig
from .kmers import all_kmers
from .mphf_lookup import MphfMeta, verified_lookup


class DeviceIndex(NamedTuple):
    """The HBM-resident index arrays (a pytree; see index/image.py)."""

    seq_pool: jnp.ndarray  # [pool] int32 base codes
    node_start: jnp.ndarray  # [N] int32
    node_len: jnp.ndarray  # [N] int32
    node_exts: jnp.ndarray  # [N] int32
    node_ec: jnp.ndarray  # [N] int32
    l_edge: jnp.ndarray  # [N, 4] int32
    r_edge: jnp.ndarray  # [N, 4] int32
    mphf_bits: jnp.ndarray  # [bw] uint32
    mphf_ranks: jnp.ndarray  # [bw] uint32
    kmer_keys: jnp.ndarray  # [nk, W] uint32
    kmer_node: jnp.ndarray  # [nk] int32
    kmer_offset: jnp.ndarray  # [nk] int32
    ec_bits: jnp.ndarray  # [M, TW] uint32 (TW=0 when bitset path disabled)


@dataclass(frozen=True)
class MapMeta:
    """Static (trace-time) mapping parameters."""

    k: int
    read_len: int  # L, the padded batch width
    allowed_mismatches: int
    left_extend_fraction: float
    max_nodes: int
    mphf: MphfMeta
    tx_words: int  # ceil(n_tx/32); 0 disables the bitset EC path

    @property
    def n_positions(self) -> int:
        return self.read_len - self.k + 1


class MapResult(NamedTuple):
    """Per-read outputs of one device mapping step."""

    mapped: jnp.ndarray  # [B] bool — any node visited
    coverage: jnp.ndarray  # [B] int32
    mismatches: jnp.ndarray  # [B] int32
    nodes: jnp.ndarray  # [B, max_nodes] int32 (-1 padded)
    n_nodes: jnp.ndarray  # [B] int32
    ec_bits: jnp.ndarray  # [B, TW] uint32 (intersected; zeros if disabled)


def _seed_tables(meta: MapMeta, idx: DeviceIndex, reads, lens):
    """All-position verified seed lookup + stride-3 next-hit table.

    Returns (seed_node [B,P], seed_off [B,P], next_hit [B,P]) where
    next_hit[b,p] is the first position q >= p, q = p (mod 3), with a
    verified seed — or the sentinel P.
    """
    P = meta.n_positions
    kmers = all_kmers(reads, meta.k)  # [B, P, W]
    node, off = verified_lookup(
        kmers,
        idx.mphf_bits,
        idx.mphf_ranks,
        meta.mphf,
        idx.kmer_keys,
        idx.kmer_node,
        idx.kmer_offset,
    )
    node, next_hit = next_hit_table(node, lens, meta.k, P)
    return node, off, next_hit


def next_hit_table(seed_node, lens, k: int, P: int):
    """Mask invalid positions and build the stride-3 next-hit table.

    Returns (masked seed_node, next_hit) where next_hit[b,p] is the first
    position q >= p with q = p (mod 3) holding a verified seed, else P.
    """
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    valid = (seed_node >= 0) & (pos <= (lens[:, None] - k))
    node = jnp.where(valid, seed_node, -1)

    cand = jnp.where(valid, pos, jnp.int32(P))
    next_hit = jnp.full_like(cand, P)
    for r in range(min(3, P)):
        sub = cand[:, r::3]
        nxt_sub = jax.lax.cummin(sub, axis=1, reverse=True)
        next_hit = next_hit.at[:, r::3].set(nxt_sub)
    return node, next_hit


def _segment_compare(meta, idx, reads, ref_base_idx, read_base_idx, maxm, allowed):
    """One masked window compare = one reference base-compare loop segment.

    ref_base_idx/read_base_idx: [B, L] absolute gather indices for window
    position j (already directed — ascending for the forward walk,
    descending for left extension).  Returns (matched, mm_add, premature),
    each [B], reproducing src/pseudoaligner.rs:151-170 / :236-255 exactly.
    """
    L = meta.read_len
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_range = j < maxm[:, None]
    pool_max = idx.seq_pool.shape[0] - 1
    ref = jnp.take(idx.seq_pool, jnp.clip(ref_base_idx, 0, pool_max), axis=0)
    red = jnp.take_along_axis(reads, jnp.clip(read_base_idx, 0, L - 1), axis=1)
    cmp = ((ref != red) & in_range).astype(jnp.int32)
    c = jnp.cumsum(cmp, axis=1)
    c_total = c[:, -1]
    premature = c_total > allowed
    matched_prem = jnp.sum((c <= allowed) & in_range, axis=1).astype(jnp.int32)
    matched = jnp.where(premature, matched_prem, maxm)
    mm_add = jnp.where(premature, jnp.int32(allowed + 1), c_total)
    return matched, mm_add, premature


def _push(nodes_buf, n_nodes, node, do_push):
    """Masked append into the fixed-size per-lane node buffer."""
    B, M = nodes_buf.shape
    rows = jnp.arange(B)
    slot = jnp.clip(n_nodes, 0, M - 1)
    cur = nodes_buf[rows, slot]
    ok = do_push & (n_nodes < M)
    nodes_buf = nodes_buf.at[rows, slot].set(jnp.where(ok, node, cur))
    return nodes_buf, n_nodes + do_push.astype(jnp.int32)


def unpack_reads(packed: jnp.ndarray, L: int) -> jnp.ndarray:
    """[B, ceil(L/16)] uint32 2-bit-packed reads -> [B, L] int32 codes.

    Host->HBM read transfer is 2-bit packed (the DnaString wire format,
    16 bases/word) — 16x less interconnect/HBM traffic than one int per
    base; unpacking is a few VPU shift-ands.
    """
    B, nw = packed.shape
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    codes = (packed[:, :, None] >> shifts) & jnp.uint32(3)
    return codes.reshape(B, nw * 16)[:, :L].astype(jnp.int32)


def pack_reads_host(codes: np.ndarray) -> np.ndarray:
    """[B, L] uint8 codes -> [B, ceil(L/16)] uint32 (NumPy, host side)."""
    B, L = codes.shape
    nw = (L + 15) // 16
    padded = np.zeros((B, nw * 16), dtype=np.uint32)
    padded[:, :L] = codes
    padded = padded.reshape(B, nw, 16)
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    return np.bitwise_or.reduce(padded << shifts, axis=2).astype(np.uint32)


def map_batch_packed(meta: MapMeta, idx: DeviceIndex, packed, lens) -> MapResult:
    """map_batch over 2-bit-packed reads (the production transfer path)."""
    return map_batch(meta, idx, unpack_reads(packed, meta.read_len), lens)


def map_batch(meta: MapMeta, idx: DeviceIndex, reads, lens) -> MapResult:
    """Map a [B, L] batch.  reads: int32 base codes, lens: int32."""
    reads = reads.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    seed_node, seed_off, next_hit = _seed_tables(meta, idx, reads, lens)
    return map_batch_with_seeds(meta, idx, reads, lens, seed_node, seed_off, next_hit)


def map_batch_with_seeds(
    meta: MapMeta, idx: DeviceIndex, reads, lens, seed_node, seed_off, next_hit
) -> MapResult:
    """The walk + EC stages, given precomputed all-position seed tables.

    Split out so the k-mer-partitioned (sharded-lookup) mode can supply
    seed tables produced by an all-to-all routed probe
    (parallel/sharded_index.py) while sharing the walk bit-for-bit.
    """
    B, L = reads.shape
    k = meta.k
    P = meta.n_positions
    allowed = meta.allowed_mismatches
    reads = reads.astype(jnp.int32)
    lens = lens.astype(jnp.int32)

    rows = jnp.arange(B)
    q0 = next_hit[:, 0] if P > 0 else jnp.full((B,), 0, jnp.int32)
    seeded = q0 < jnp.int32(P)
    q0c = jnp.clip(q0, 0, P - 1)
    node0 = seed_node[rows, q0c]
    off0 = seed_off[rows, q0c]

    cov = jnp.zeros(B, jnp.int32)
    mm = jnp.zeros(B, jnp.int32)
    nodes_buf = jnp.full((B, meta.max_nodes), -1, jnp.int32)
    n_nodes = jnp.zeros(B, jnp.int32)

    # left-extension gate: kmer_pos >= (LEFT_EXTEND_FRACTION * L) as usize
    # (src/pseudoaligner.rs:77,126)
    thresh = jnp.floor(
        jnp.float32(meta.left_extend_fraction) * lens.astype(jnp.float32)
    ).astype(jnp.int32)

    # ---- left extension (src/pseudoaligner.rs:124-205) ----
    def l_cond(s):
        return jnp.any(s["active"])

    def l_body(s):
        act = s["active"]
        lnode = s["node"]
        pko = s["pko"]
        last_pos = s["last_pos"]
        maxm = jnp.minimum(last_pos + 1, pko + 1)
        jj = jnp.arange(L, dtype=jnp.int32)[None, :]
        ref_idx = idx.node_start[jnp.clip(lnode, 0, None)][:, None] + pko[:, None] - jj
        read_idx = last_pos[:, None] - jj
        matched, mm_add, prem = _segment_compare(
            meta, idx, reads, ref_idx, read_idx, maxm, allowed
        )
        cov2 = jnp.where(act, s["cov"] + matched, s["cov"])
        mm2 = jnp.where(act, s["mm"] + mm_add, s["mm"])
        stop = (last_pos + 1 - matched == 0) | prem
        lp2 = last_pos - matched
        nb = jnp.take_along_axis(reads, jnp.clip(lp2, 0, L - 1)[:, None], axis=1)[:, 0]
        exts = idx.node_exts[jnp.clip(lnode, 0, None)]
        has = ((exts >> (4 + nb)) & 1) == 1
        follow = act & ~stop & has
        new_node = idx.l_edge[jnp.clip(lnode, 0, None), jnp.clip(nb, 0, 3)]
        nbuf, ncnt = _push(s["nodes_buf"], s["n_nodes"], new_node, follow)
        new_pko = idx.node_len[jnp.clip(new_node, 0, None)] - k
        return {
            "active": follow,
            "node": jnp.where(follow, new_node, lnode),
            "pko": jnp.where(follow, new_pko, pko),
            "last_pos": jnp.where(act, lp2, last_pos),
            "cov": cov2,
            "mm": mm2,
            "nodes_buf": nbuf,
            "n_nodes": ncnt,
        }

    l_state = {
        "active": seeded & (q0 >= thresh),
        "node": node0,
        "pko": jnp.where(off0 > 0, off0 - 1, 0),
        "last_pos": q0 - 1,
        "cov": cov,
        "mm": mm,
        "nodes_buf": nodes_buf,
        "n_nodes": n_nodes,
    }
    l_state = jax.lax.while_loop(l_cond, l_body, l_state)

    # ---- forward walk (src/pseudoaligner.rs:208-302) ----
    def f_cond(s):
        return jnp.any(s["active"])

    def f_body(s):
        act = s["active"]
        fnode = jnp.clip(s["node"], 0, None)
        koff = s["koff"]
        kpos = s["kpos"] + k
        cov2 = jnp.where(act, s["cov"] + k, s["cov"])
        nbuf, ncnt = _push(s["nodes_buf"], s["n_nodes"], fnode, act)

        ref_off = koff + k
        informative = idx.node_len[fnode] - ref_off
        remaining = lens - kpos
        maxm = jnp.maximum(jnp.minimum(remaining, informative), 0)
        jj = jnp.arange(L, dtype=jnp.int32)[None, :]
        ref_idx = idx.node_start[fnode][:, None] + ref_off[:, None] + jj
        read_idx = kpos[:, None] + jj
        matched, mm_add, prem = _segment_compare(
            meta, idx, reads, ref_idx, read_idx, maxm, allowed
        )
        kpos = kpos + matched
        cov2 = jnp.where(act, cov2 + matched, cov2)
        mm2 = jnp.where(act, s["mm"] + mm_add, s["mm"])

        at_end = kpos >= lens
        nb = jnp.take_along_axis(reads, jnp.clip(kpos, 0, L - 1)[:, None], axis=1)[:, 0]
        exts = idx.node_exts[fnode]
        hasr = ~prem & (((exts >> nb) & 1) == 1)
        follow = act & ~at_end & hasr
        nxt_node = idx.r_edge[fnode, jnp.clip(nb, 0, 3)]

        # re-seed path (src/pseudoaligner.rs:285-299)
        can_seek = act & ~at_end & ~hasr & (kpos <= lens - k)
        q = next_hit[rows, jnp.clip(kpos, 0, P - 1)]
        found = can_seek & (q < P)
        qc = jnp.clip(q, 0, P - 1)
        rs_node = seed_node[rows, qc]
        rs_off = seed_off[rows, qc]

        active2 = follow | found
        node2 = jnp.where(follow, nxt_node, jnp.where(found, rs_node, s["node"]))
        koff2 = jnp.where(follow, 0, jnp.where(found, rs_off, koff))
        kpos2 = jnp.where(follow, kpos - (k - 1), jnp.where(found, q, kpos))
        cov2 = jnp.where(follow, cov2 - (k - 1), cov2)
        return {
            "active": active2,
            "node": node2,
            "koff": koff2,
            "kpos": kpos2,
            "cov": cov2,
            "mm": mm2,
            "nodes_buf": nbuf,
            "n_nodes": ncnt,
        }

    f_state = {
        "active": seeded,
        "node": node0,
        "koff": off0,
        "kpos": q0,
        "cov": l_state["cov"],
        "mm": l_state["mm"],
        "nodes_buf": l_state["nodes_buf"],
        "n_nodes": l_state["n_nodes"],
    }
    f_state = jax.lax.while_loop(f_cond, f_body, f_state)

    nodes_buf = f_state["nodes_buf"]
    n_nodes = f_state["n_nodes"]
    mapped = n_nodes > 0

    # ---- EC intersection via bitsets (small transcriptomes) ----
    if meta.tx_words > 0:
        TW = meta.tx_words
        ones = jnp.full((B, TW), 0xFFFFFFFF, jnp.uint32)

        def ec_body(j, bits):
            nid = jnp.clip(nodes_buf[:, j], 0, None)
            row = idx.ec_bits[idx.node_ec[nid]]  # [B, TW]
            row = jnp.where((j < n_nodes)[:, None], row, jnp.uint32(0xFFFFFFFF))
            return bits & row

        ec_bits = jax.lax.fori_loop(0, meta.max_nodes, ec_body, ones)
        ec_bits = jnp.where(mapped[:, None], ec_bits, jnp.uint32(0))
    else:
        ec_bits = jnp.zeros((B, 0), jnp.uint32)

    return MapResult(
        mapped=mapped,
        coverage=f_state["cov"],
        mismatches=f_state["mm"],
        nodes=nodes_buf,
        n_nodes=n_nodes,
        ec_bits=ec_bits,
    )


# ---------------------------------------------------------------------------
# image -> device conversion
# ---------------------------------------------------------------------------


def build_ec_bitsets(ec_offsets: np.ndarray, ec_txs: np.ndarray, n_tx: int) -> np.ndarray:
    """[M, ceil(n_tx/32)] uint32: bit t of word w = transcript 32w+t."""
    M = len(ec_offsets) - 1
    TW = (n_tx + 31) // 32
    bits = np.zeros((M, TW), dtype=np.uint32)
    lens = np.diff(ec_offsets.astype(np.int64))
    ec_of_entry = np.repeat(np.arange(M), lens)
    tx = ec_txs.astype(np.int64)
    np.bitwise_or.at(
        bits, (ec_of_entry, tx >> 5), np.uint32(1) << (tx & 31).astype(np.uint32)
    )
    return bits


def device_index_from_image(image, config: AlignerConfig):
    """IndexImage -> (DeviceIndex of numpy arrays, MapMeta).

    The caller `jax.device_put`s the DeviceIndex (or shards it via
    parallel/mesh.py).
    """
    use_bitset = len(image.tx_names) <= config.bitset_tx_threshold
    tx_words = (len(image.tx_names) + 31) // 32 if use_bitset else 0
    ec_bits = (
        build_ec_bitsets(image.ec_offsets, image.ec_txs, len(image.tx_names))
        if use_bitset
        else np.zeros((1, 0), np.uint32)
    )
    dev = DeviceIndex(
        seq_pool=image.seq_pool.astype(np.int32),
        node_start=image.node_start.astype(np.int32),
        node_len=image.node_len.astype(np.int32),
        node_exts=image.node_exts.astype(np.int32),
        node_ec=image.node_ec.astype(np.int32),
        l_edge=image.l_edge.astype(np.int32),
        r_edge=image.r_edge.astype(np.int32),
        mphf_bits=image.mphf.bits,
        mphf_ranks=image.mphf.ranks,
        kmer_keys=image.kmer_keys,
        kmer_node=image.kmer_node.astype(np.int32),
        kmer_offset=image.kmer_offset.astype(np.int32),
        ec_bits=ec_bits,
    )
    meta = MapMeta(
        k=image.k,
        read_len=config.max_read_len,
        allowed_mismatches=config.allowed_mismatches,
        left_extend_fraction=config.left_extend_fraction,
        max_nodes=config.max_nodes,
        mphf=MphfMeta(
            seeds=tuple(int(x) for x in image.mphf.seeds),
            masks=tuple(int(x) for x in image.mphf.masks),
            word_offsets=tuple(int(x) for x in image.mphf.word_offsets),
            key_offsets=tuple(int(x) for x in image.mphf.key_offsets),
        ),
        tx_words=tx_words,
    )
    return dev, meta
