"""The batched read-mapping engine — the framework's hot path.

TPU-native re-design of `map_read_to_nodes_with_mismatch` + EC intersection
(reference: src/pseudoaligner.rs:64-356).  The reference maps one read per
thread with scalar loops; here a whole [B, L] batch advances in lockstep.

The design is driven by a measured TPU cost model (tools/tpu_worker.py
experiments on v5e; PERF.md): a gather op costs ~0.3ms fixed + ~2-20ns
per gathered index (cache-resident vs >128MB tables), with row width
effectively free ONLY while downstream use lets XLA slice the gather to
a few columns (consuming all words of a wide row prices it per element)
— so the engine minimizes *gather-op and gathered-index counts*, keeps
probe rows narrow, and does everything else as dense VPU work:

- seed lookup: every read position's k-mer is probed up front.  The default
  seed index is a 4-slot bucketized cuckoo table storing (key, node,
  offset) together (index/cuckoo.py): a probe is TWO row gathers + register
  compares, vs ~17 gathers for the BBHash MPHF probe (kept as the
  memory-lean `seed_index="mphf"` option).  The stride-3 seed scan and all
  re-seeds (src/pseudoaligner.rs:91-114,287-299) then become reverse-cummin
  next-hit table lookups;
- the base-by-base comparison loops (src/pseudoaligner.rs:151-170,236-255)
  are masked L-wide vector window compares.  Both the graph sequence pool
  and the reads stay 2-bit packed: a window fetch is two aligned row
  gathers from the [., 8]-word pool, the arbitrary-offset alignment is a
  dense 8-way word select + per-lane bit shift, and mismatch flags come
  from XOR + static per-column unpack — zero element gathers.  One
  cumulative sum reproduces the per-segment SNP budget exactly (the base
  that exceeds the budget counts toward mismatches but not coverage);
- the irregular unitig walk keeps its data-dependent control flow as masked
  `lax.while_loop`s; each iteration does ONE fused node-row gather
  (start/len/exts/ec + both edge tables in a single [N, 12] row);
- the EC intersection (src/pseudoaligner.rs:323-356,389-418) is an
  AND-reduction over per-class transcript bitsets, iterated only to the
  batch's actual max node count, with a host CSR-merge fallback for very
  large transcriptomes.

Semantics are bit-identical to the golden oracle (tests/test_map_device.py
checks every read of the bundled FASTQ).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlignerConfig
from ..index.cuckoo import SLOTS as CK_SLOTS, EMPTY as CK_EMPTY, build_cuckoo_fast
from .hashing import hash_kmer_jnp
from .kmers import all_kmers
from .mphf_lookup import MphfMeta, verified_lookup


class DeviceIndex(NamedTuple):
    """The HBM-resident index arrays (a pytree; see index/image.py)."""

    pool_rows: jnp.ndarray  # [R, 8] uint32 — 2-bit packed pool, 128 bases/row,
    #                          front/back zero padding of meta.pool_pad bases
    node_row: jnp.ndarray  # [N, 12] int32 — start(+pad), len, exts, ec,
    #                         r_edge[4], l_edge[4] (r before l: the
    #                         forward walk reads a contiguous 0..7 prefix)
    cuckoo: jnp.ndarray  # cuckoo mode: [NB, CK_SLOTS*W] uint32 keys-only
    #   rows (empty slots hold all-ones keys; a genuine all-ones k-mer —
    #   possible only when 2k == 32W — is relocated to meta.ones_node/
    #   ones_off); bucket1 mode: full [NB, B1_SLOTS*(W+2)] rows; dummy if
    #   mphf mode.  Keys ride separate from values because gathers are
    #   priced per ELEMENT consumed and row widths quantize to powers of
    #   two (PERF.md): the probe compares keys from two 8-word rows and
    #   fetches only the ONE winning slot's value from cuckoo_vals.
    cuckoo_vals: jnp.ndarray  # [NB*CK_SLOTS*2] uint32 FLAT (node, offset)
    #   pairs — slot s's value at (2s, 2s+1).  1D because a [S, 2] array
    #   tile-pads 64x as a TPU HLO temp (chip-measured OOM building it
    #   on device, round 5); the probe's value fetch is a single gather
    #   of indices 2*vidx + {0,1}, same element count as the 2-wide row
    mphf_bits: jnp.ndarray  # [bw] uint32 (legacy/memory-lean mode)
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
    seed_index: str = "cuckoo"  # "cuckoo" | "bucket1" | "mphf"
    cuckoo_mask: int = 0
    bucket_seed: int = 0  # bucket1 mode: the (re-salted) probe hash seed
    # the all-ones k-mer's payload when it is a REAL key (2k == 32W only;
    # empty slots reuse the all-ones key pattern, so its entry lives here
    # and the probe resolves it with a dense compare): (-1, -1) = absent
    ones_node: int = -1
    ones_off: int = -1
    pool_pad: int = 256  # zero bases padded at pool front (and >= back)
    # Overlapping pool rows: rows start every pool_stride bases (0 =
    # legacy 128-aligned rows).  Set to 128 - 16*(cmp_words+1) when that
    # is >= 16, making every compare window single-row (8 gathered
    # elements instead of 16 per lane per walk iteration — PERF.md).
    pool_stride: int = 0
    # Compact serving outputs: per-read distinct EC ids [B, distinct_cap]
    # instead of node lists + EC bitsets — host->device transfer drops from
    # ~360B to ~34B per read (the tunnel/PCIe link is the serving
    # bottleneck; EC list materialization moves to a memoized host CSR
    # intersection).  0 disables (full debug outputs).
    distinct_cap: int = 0
    # Lazy seeding: eagerly probe only the stride-3 residue-0 positions
    # (the initial scan's entire search space — 3x fewer probe gathers);
    # re-seeds at other residues probe lazily inside the walk loop
    # (cuckoo seed index only).
    lazy_seeds: bool = False
    # Forward-walk iteration cap (0 = unbounded).  Lanes still active at
    # the cap are flagged (-3 in the compact output) and re-run exactly
    # through the uncapped fallback pass — the while_loop otherwise runs
    # the whole batch to the worst lane's trip count (max ~23 vs mean ~1.3
    # on the bundled workload).
    max_walk_iters: int = 0
    # Left-extension iteration cap (0 = unbounded).  Same contract as
    # max_walk_iters: lanes still following left edges at the cap carry the
    # -3 marker and re-run through the exact host/device fallback.  The
    # left loop otherwise runs the whole batch to the deepest lane's
    # left-chain length (measured ~8 trips at B=65k for a ~66ms/step cost
    # — PERF.md), while the typical lane needs 0-1.
    max_left_iters: int = 0
    # Walk-loop body unroll factor: each while_loop iteration executes
    # `walk_unroll` masked walk steps.  Per-iteration fixed costs (op
    # dispatch ~1.3ms + gather fixed ~0.3ms on this backend — PERF.md)
    # amortize across the group; lanes finishing mid-group are masked, so
    # semantics are unchanged.  Iteration caps count individual steps and
    # effectively round up to a multiple of the unroll.
    walk_unroll: int = 1
    # Two-tier lane compaction (PERF.md): while_loop shapes are static, so
    # a full-B loop pays ~8ns per gather index for every lane even after it
    # finishes.  left_compact > 0 runs the left-extension loop on a
    # compacted buffer of ceil(left_compact * B) lanes (only lanes passing
    # the late-hit gate enter it — a small minority); walk_split > 0 runs
    # the first walk_split forward iterations at full B, then compacts the
    # still-active tail into ceil(walk_compact * B) lanes for the rest.
    # Lanes beyond capacity carry the -3 exact-fallback marker
    # (deterministic: ascending lane order).  Requires compact outputs and
    # a collective-free loop body; 0 disables.
    left_compact: float = 0.0
    walk_split: int = 0
    walk_compact: float = 0.25
    # Two-tier seed probing (requires lazy_seeds + compact outputs): probe
    # grid position 0 for ALL lanes, then the 13 later grid positions only
    # for a compacted buffer of ceil(seed_compact * B) miss-at-0 lanes —
    # the probe pass is the largest single step component and most lanes
    # hit at position 0.  Lanes that hit at 0 have no next-hit table, so
    # their in-loop re-seeds take the seek path (~+1 iteration for the
    # ~7% of lanes that break on-grid); miss-at-0 lanes beyond capacity
    # carry the -3 exact-fallback marker.  0 disables.
    seed_compact: float = 0.0
    # Straight-line capped loops: when an iteration cap is set, apply the
    # (masked) body exactly cap times as unrolled straight-line code
    # instead of a lax.while_loop.  Measured a WASH vs while_loop at
    # serving caps on this backend (PERF.md), so default off; kept as a
    # knob for other backends.  Finished lanes are masked no-ops, so
    # semantics are identical.  Ignored for uncapped or collective
    # (global_mode) walks.
    walk_straightline: bool = False
    # Compact-output transfer compression (the tunneled link is ~55MB/s —
    # PERF.md): EC ids ride as int16 when the class count fits, coverage
    # as uint8 when the batch width fits.  Set by device_index_from_image.
    ec_out_16: bool = False
    cov_out_8: bool = False

    @property
    def n_positions(self) -> int:
        return self.read_len - self.k + 1

    @property
    def cmp_words(self) -> int:
        """Words in an extracted compare window (L bases + shift spill)."""
        return (self.read_len + 15) // 16 + 1

    @property
    def pool_fetch_rows(self) -> int:
        """Pool rows fetched per window: the word select reads
        (cmp_words + 1) words starting at any in-row word offset (up to
        7), so coverage must span 127 + 16*(cmp_words+1) bases.  The old
        `(L+127)//128 + 1` under-provisioned for L in [81, 128]: at pool
        offsets o > 128*NR - 16*(cmp_words+1) the select ran off the
        fetched rows and _select_words silently produced zeros — wrong
        compare windows (caught by the k=64 L=120 fuzz parity test)."""
        return (127 + 16 * (self.cmp_words + 1) + 127) // 128


class MapResult(NamedTuple):
    """Per-read outputs of one device mapping step.

    In compact mode (meta.distinct_cap > 0) `nodes`/`ec_bits` are empty and
    `ec_distinct` carries each read's distinct EC ids (-1 padded; the last
    slot is -2 when more than distinct_cap classes were visited, signalling
    the host to re-map that read exactly)."""

    mapped: jnp.ndarray  # [B] bool — any node visited
    coverage: jnp.ndarray  # [B] int32
    mismatches: jnp.ndarray  # [B] int32
    nodes: jnp.ndarray  # [B, max_nodes] int32 (-1 padded)
    n_nodes: jnp.ndarray  # [B] int32
    ec_bits: jnp.ndarray  # [B, TW] uint32 (intersected; zeros if disabled)
    ec_distinct: jnp.ndarray  # [B, DC] int32 (compact mode; else [B, 0])


# ---------------------------------------------------------------------------
# packed windows
# ---------------------------------------------------------------------------


def unpack_reads(packed: jnp.ndarray, L: int) -> jnp.ndarray:
    """[B, ceil(L/16)] uint32 2-bit-packed reads -> [B, L] int32 codes."""
    B, nw = packed.shape
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    codes = (packed[:, :, None] >> shifts) & jnp.uint32(3)
    return codes.reshape(B, nw * 16)[:, :L].astype(jnp.int32)


def pack_reads_host(codes: np.ndarray) -> np.ndarray:
    """[B, L] uint8 codes -> [B, ceil(L/16)] uint32 (host side; C++ with
    NumPy fallback — ~14ms -> ~2ms per 65k batch on the serving path)."""
    try:
        from ..io.native import pack_reads

        return pack_reads(np.asarray(codes, dtype=np.uint8))
    except Exception:
        pass
    B, L = codes.shape
    nw = (L + 15) // 16
    padded = np.zeros((B, nw * 16), dtype=np.uint32)
    padded[:, :L] = codes
    padded = padded.reshape(B, nw, 16)
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    return np.bitwise_or.reduce(padded << shifts, axis=2).astype(np.uint32)


def lens_link_dtype(read_len: int):
    """Narrowest numpy dtype that fits read lengths up to `read_len`, for
    the lens vector on the serialized host->device link (uint8 saves 3/4
    of the vector for L<=255); every kernel casts lens to int32 in-graph,
    so this is the ONE place the width/cast contract lives."""
    return (np.uint8 if read_len <= 255 else
            np.uint16 if read_len <= 65535 else np.int32)


def _select_words(wcat: jnp.ndarray, wo: jnp.ndarray, nw_out: int) -> jnp.ndarray:
    """Per-lane word-granularity shift: out[:, i] = wcat[:, wo + i].

    wcat: [B, NW], wo: [B] in [0, NW - nw_out].  Dense NW-way masked select
    (no gathers)."""
    B, NW = wcat.shape
    out = jnp.zeros((B, nw_out), dtype=wcat.dtype)
    for r in range(NW - nw_out + 1):
        sel = (wo == r)[:, None]
        out = jnp.where(sel, jax.lax.dynamic_slice_in_dim(wcat, r, nw_out, 1), out)
    return out


def _shift_words(sel: jnp.ndarray, s: jnp.ndarray, nw_out: int) -> jnp.ndarray:
    """Per-lane sub-word bit shift: logical >> s across the word vector.

    sel: [B, nw_out+1] uint32 little-endian words, s: [B] even bit counts in
    [0, 30].  Returns [B, nw_out]."""
    su = s.astype(jnp.uint32)[:, None]
    lo = sel[:, :nw_out] >> su
    hi = jnp.where(
        su > 0, sel[:, 1 : nw_out + 1] << ((jnp.uint32(32) - su) & jnp.uint32(31)), 0
    )
    return lo | hi


def _extract_pool_window(meta: MapMeta, idx: DeviceIndex, q: jnp.ndarray):
    """Ascending packed window of L bases starting at padded-pool base q.

    q: [B] int32 (must satisfy 0 <= q and q + L < pool end padding).
    Returns [B, cmp_words] uint32 where base (q+t) sits at bits
    [2*(t%16)] of word t//16.  Two-plus aligned row gathers + dense ops."""
    return _extract_pool_window_rows(meta, idx.pool_rows, q)


def _extract_pool_window_rows(meta: MapMeta, pool_rows: jnp.ndarray, q: jnp.ndarray):
    """_extract_pool_window against an explicit [R, 8] pool-row array
    (used by the graph-sharded mode, where each shard extracts windows
    from its local pool slice)."""
    if meta.pool_stride:
        # overlapping rows: r = q // stride always covers [q, q + W)
        # (W = 16*(cmp_words+1) and stride = 128 - W, so q mod stride
        # <= stride <= 128 - W); one 8-word row gather per lane
        S = meta.pool_stride
        r = jnp.clip(q // S, 0, pool_rows.shape[0] - 1)
        row = jnp.take(pool_rows, r, axis=0)  # [B, 8]
        o = q - r * S
        sel = _select_words(row, (o >> 4).astype(jnp.int32),
                            meta.cmp_words + 1)
        return _shift_words(sel, (o & 15) * 2, meta.cmp_words)
    NR = meta.pool_fetch_rows
    r0 = (q >> 7).astype(jnp.int32)
    # one gather for all NR consecutive rows (stacked indices) — same index
    # count as NR separate gathers but 1/NR the per-op fixed cost
    ridx = jnp.clip(
        r0[:, None] + jnp.arange(NR, dtype=jnp.int32)[None, :],
        0,
        pool_rows.shape[0] - 1,
    )
    wcat = jnp.take(pool_rows, ridx, axis=0).reshape(q.shape[0], NR * 8)
    o = q & 127
    wo = (o >> 4).astype(jnp.int32)  # word offset in row 0: 0..7
    sel = _select_words(wcat, wo, meta.cmp_words + 1)
    return _shift_words(sel, (o & 15) * 2, meta.cmp_words)


def _extract_read_window(meta: MapMeta, rp: jnp.ndarray, q: jnp.ndarray):
    """Ascending packed window of L bases starting at padded-read base q.

    rp: [B, RW] uint32 padded packed reads (front pad = read_front_words
    words of zeros); q includes the front pad offset."""
    wo = (q >> 4).astype(jnp.int32)
    sel = _select_words(rp, wo, meta.cmp_words + 1)
    return _shift_words(sel, (q & 15) * 2, meta.cmp_words)


def read_front_words(meta: MapMeta) -> int:
    """Zero-pad words on each side of the packed read array: the left
    extension looks back up to L-1 bases, and forward windows start as far
    as base L; +2 words keep the word-select range in bounds."""
    return (meta.read_len + 15) // 16 + 2


def pad_packed_reads(meta: MapMeta, packed: jnp.ndarray) -> jnp.ndarray:
    """[B, ceil(L/16)] -> [B, fw + ceil(L/16) + fw] zero-padded packed."""
    B, nw = packed.shape
    fw = read_front_words(meta)
    z = jnp.zeros((B, fw), dtype=jnp.uint32)
    return jnp.concatenate([z, packed, z], axis=1)


def _rev2bit(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the sixteen 2-bit groups of each uint32 lane."""
    x = ((x & jnp.uint32(0x0000FFFF)) << 16) | (x >> 16)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    return x


def _kmer_at(meta: MapMeta, rp: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """k-mer words (dna.pack_kmers layout) at per-lane read position q.

    The ascending packed window puts base (q+t) at bit 2t; the k-mer
    layout wants the leftmost base most significant — so reverse each
    16-base group and place groups at their static bit offsets.  Dense ops
    only; used by the lazy re-seed probe inside the walk loop."""
    from ..dna import kmer_words

    k = meta.k
    W = kmer_words(k)
    fw_bases = read_front_words(meta) * 16
    win = _extract_read_window(meta, rp, q + fw_bases)
    n_groups = (k + 15) // 16
    out = [jnp.zeros_like(win[:, 0]) for _ in range(W)]
    for g in range(n_groups):
        wg = win[:, g]
        rem = k - 16 * g
        if rem < 16:  # mask bases beyond k before reversing
            wg = wg & jnp.uint32((1 << (2 * rem)) - 1)
        rg = _rev2bit(wg)
        s = 2 * k - 32 - 32 * g  # bit offset of this group's LSB
        if s >= 0:
            j0, sh = s // 32, s % 32
            out[j0] = out[j0] | (rg << jnp.uint32(sh))
            if sh and j0 + 1 < W:
                out[j0 + 1] = out[j0 + 1] | (rg >> jnp.uint32(32 - sh))
        else:
            out[0] = out[0] | (rg >> jnp.uint32(-s))
    return jnp.stack(out, axis=-1)


def _mismatch_bits(meta: MapMeta, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Packed windows -> [B, L] int32 mismatch flags (vector unpack)."""
    x = a ^ b
    B, CW = x.shape
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    u = (x[:, :, None] >> shifts) & jnp.uint32(3)
    return (u.reshape(B, CW * 16)[:, : meta.read_len] != 0).astype(jnp.int32)


def _segment_math(meta: MapMeta, mm_flags, maxm, allowed):
    """Per-segment SNP budget arithmetic (src/pseudoaligner.rs:151-170,
    :236-255): returns (matched, mm_add, premature), each [B]."""
    L = meta.read_len
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_range = j < maxm[:, None]
    cmp = mm_flags * in_range.astype(jnp.int32)
    c = jnp.cumsum(cmp, axis=1)
    c_total = c[:, -1]
    premature = c_total > allowed
    matched_prem = jnp.sum((c <= allowed) & in_range, axis=1).astype(jnp.int32)
    matched = jnp.where(premature, matched_prem, maxm)
    mm_add = jnp.where(premature, jnp.int32(allowed + 1), c_total)
    return matched, mm_add, premature


# ---------------------------------------------------------------------------
# seed lookup
# ---------------------------------------------------------------------------


def cuckoo_lookup(meta: MapMeta, idx: DeviceIndex, words: jnp.ndarray):
    """[..., W] kmer words -> (node, offset) int32, -1 on miss.

    Split key/value probe: gathers are priced per ELEMENT consumed and
    row widths quantize to powers of two (PERF.md: an 8-word keys row
    gathers ~1.5x faster than 9- or 16-word), so the two bucket rows
    carry ONLY the slot keys (SLOTS*W words; empty slots hold all-ones)
    and the winning slot's (node, offset) comes from a second 2-wide
    gather — 18 elements per probe instead of the fused layout's 32.
    A genuine all-ones k-mer (possible only when 2k == 32W) lives in
    meta.ones_node/ones_off and resolves with a dense compare."""
    from ..index.cuckoo import H1_SEED, H2_SEED

    W = words.shape[-1]
    mask = jnp.uint32(meta.cuckoo_mask)
    # both candidate buckets in ONE gather (stacked indices): same index
    # count, half the per-op fixed cost
    h1 = hash_kmer_jnp(words, jnp.uint32(H1_SEED)) & mask
    h2 = hash_kmer_jnp(words, jnp.uint32(H2_SEED)) & mask
    hh = jnp.stack([h1, h2], axis=-1).astype(jnp.int32)  # [..., 2]
    both = jnp.take(idx.cuckoo, hh, axis=0)  # [..., 2, SLOTS*W]
    found = jnp.zeros(words.shape[:-1], dtype=bool)
    # first matching slot in (bucket, slot) priority order -> flat value
    # index (a present key matches in exactly one slot; all-ones queries
    # are overridden below, so empty-slot matches cannot leak through)
    vidx = jnp.zeros(words.shape[:-1], dtype=jnp.uint32)
    for b in range(2):
        rows = both[..., b, :]
        hb = h1 if b == 0 else h2
        for s in range(CK_SLOTS):
            base = s * W
            keym = rows[..., base] == words[..., 0]
            for w in range(1, W):
                keym &= rows[..., base + w] == words[..., w]
            hit = keym & ~found
            vidx = jnp.where(hit, hb * jnp.uint32(CK_SLOTS) + s, vidx)
            found = found | keym
    vals = jnp.take(  # flat pairs: ONE gather of 2*vidx + {0, 1}
        idx.cuckoo_vals,
        vidx.astype(jnp.int32)[..., None] * 2
        + jnp.arange(2, dtype=jnp.int32),
        axis=0,
    )  # [..., 2]
    node = jnp.where(found, vals[..., 0].astype(jnp.int32), -1)
    off = jnp.where(found, vals[..., 1].astype(jnp.int32), -1)
    if meta.k * 2 == 32 * W:
        # all-ones is a VALID k-mer at word-filling k: its entry rides in
        # meta scalars; table matches at all-ones are empty slots
        ones = jnp.ones(words.shape[:-1], dtype=bool)
        for w in range(W):
            ones &= words[..., w] == jnp.uint32(0xFFFFFFFF)
        node = jnp.where(ones, jnp.int32(meta.ones_node), node)
        off = jnp.where(ones, jnp.int32(meta.ones_off), off)
    else:
        # all-ones key words are unreachable for real k-mers (upper bits
        # zero), so any match there would be an empty slot: none occur
        pass
    return node, off


def bucket1_lookup(meta: MapMeta, idx: DeviceIndex, words: jnp.ndarray):
    """[..., W] kmer words -> (node, offset) int32, -1 on miss.

    ONE row gather (single-hash 16-slot bucket; index/cuckoo.py
    build_bucket1) + register key compares.  MEASURED NEGATIVE vs the
    cuckoo probe on this backend (PERF.md): reading all 64 row words
    makes the gather per-element-priced (~11x slower end to end), so
    this stays an experimental mode."""
    from ..index.cuckoo import B1_SLOTS

    W = words.shape[-1]
    mask = jnp.uint32(meta.cuckoo_mask)
    node = jnp.full(words.shape[:-1], -1, dtype=jnp.int32)
    off = jnp.full(words.shape[:-1], -1, dtype=jnp.int32)
    h = (hash_kmer_jnp(words, jnp.uint32(meta.bucket_seed)) & mask).astype(
        jnp.int32
    )
    rows = jnp.take(idx.cuckoo, h, axis=0)  # [..., B1_SLOTS*(W+2)]
    for s in range(B1_SLOTS):
        base = s * (W + 2)
        keym = jnp.ones(words.shape[:-1], dtype=bool)
        for w in range(W):
            keym &= rows[..., base + w] == words[..., w]
        n = rows[..., base + W]
        keym &= n != jnp.uint32(CK_EMPTY)
        hit = keym & (node < 0)
        node = jnp.where(hit, n.astype(jnp.int32), node)
        off = jnp.where(hit, rows[..., base + W + 1].astype(jnp.int32), off)
    return node, off


def seed_probe(meta: MapMeta, idx: DeviceIndex, words: jnp.ndarray):
    """Dispatch to the configured probe structure (cuckoo | bucket1)."""
    if meta.seed_index == "bucket1":
        return bucket1_lookup(meta, idx, words)
    return cuckoo_lookup(meta, idx, words)


def _seed_tables(meta: MapMeta, idx: DeviceIndex, reads, lens):
    """All-position verified seed lookup -> fused stride-3 next-hit table.

    With meta.lazy_seeds, only the residue-0 positions (the initial
    stride-3 scan's entire search space) are probed eagerly; other
    residues stay misses in the table and are probed lazily inside the
    walk loop when a re-seed lands there.

    Returns (nh3, has_tbl, seed_over): has_tbl is None for the dense
    build; with meta.seed_compact (two-tier probing) it marks the lanes
    whose next-hit rows are COMPLETE (in-loop table re-seeds allowed —
    others seek), and seed_over marks miss-at-0 lanes beyond the compact
    capacity (deterministic -3 exact fallback)."""
    P = meta.n_positions
    kmers = all_kmers(reads, meta.k)  # [B, P, W]
    probed = meta.seed_index in ("cuckoo", "bucket1")
    B = reads.shape[0]
    use_tier = (
        probed and meta.lazy_seeds and meta.seed_compact > 0
        and meta.distinct_cap > 0 and P > 1
    )
    if use_tier:
        # tier 1: grid position 0, every lane
        node0, off0 = seed_probe(meta, idx, kmers[:, 0])
        miss0 = node0 < 0
        # tier 2: the 13 later grid positions, compacted miss@0 lanes
        Cs = _compact_cap(B, meta.seed_compact)
        idxs, valids, seed_over = _compact_select(miss0, Cs)
        kc = jnp.take(kmers[:, 3::3], idxs, axis=0)  # [Cs, P3-1, W]
        nodec, offc = seed_probe(meta, idx, kc)
        node = jnp.full((B, P), -1, jnp.int32)
        off = jnp.full((B, P), -1, jnp.int32)
        node = node.at[:, 0].set(node0)
        off = off.at[:, 0].set(off0)
        tgt = jnp.where(valids, idxs, B)  # dropped for invalid slots
        node = node.at[tgt, 3::3].set(nodec, mode="drop")
        off = off.at[tgt, 3::3].set(offc, mode="drop")
        # complete rows: hit@0 lanes only have row 0 -> they must seek
        has_tbl = jnp.zeros((B,), bool).at[tgt].set(valids, mode="drop")
        _, nh3 = next_hit_table(node, off, lens, meta.k, P)
        return nh3, has_tbl, seed_over
    if probed and meta.lazy_seeds:
        node3, off3 = seed_probe(meta, idx, kmers[:, ::3])
        node = jnp.full((B, P), -1, jnp.int32)
        off = jnp.full((B, P), -1, jnp.int32)
        node = node.at[:, ::3].set(node3)
        off = off.at[:, ::3].set(off3)
    elif probed:
        node, off = seed_probe(meta, idx, kmers)
    else:
        node, off = verified_lookup(
            kmers,
            idx.mphf_bits,
            idx.mphf_ranks,
            meta.mphf,
            idx.kmer_keys,
            idx.kmer_node,
            idx.kmer_offset,
        )
    _, nh3 = next_hit_table(node, off, lens, meta.k, P)
    return nh3, None, None


def next_hit_table(seed_node, seed_off, lens, k: int, P: int):
    """Mask invalid positions and build the FUSED stride-3 next-hit table.

    Returns (node, nh3) where nh3[b, p] = (q, seed_node[b, q],
    seed_off[b, q]) for q = the nearest valid seed position >= p on p's
    stride-3 residue grid (q = P with don't-care node/off when none
    exists).  Fusing the position and its (node, offset) into one
    [B, P, 3] row makes every in-loop re-seed ONE [B]-index gather
    instead of two — walk iterations are gather-index-bound (PERF.md).
    Built with per-residue suffix fill-scans (first-valid is
    associative): dense VPU work, no gathers."""
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    valid = (seed_node >= 0) & (pos <= (lens[:, None] - k))
    node = jnp.where(valid, seed_node, -1)
    off = jnp.where(valid, seed_off, -1)

    cand = jnp.where(valid, pos, jnp.int32(P))
    nh3 = jnp.full(cand.shape + (3,), jnp.int32(P))

    def first_valid(a, b):
        # reverse=True passes a = accumulated later-index suffix, b = the
        # earlier element (verified empirically): keep b when it's valid
        take_b = b[0] < P
        return tuple(jnp.where(take_b, y, x) for x, y in zip(a, b))

    for r in range(min(3, P)):
        sub = (cand[:, r::3], node[:, r::3], off[:, r::3])
        sc = jax.lax.associative_scan(first_valid, sub, reverse=True, axis=1)
        nh3 = nh3.at[:, r::3].set(jnp.stack(sc, axis=-1))
    return node, nh3


# ---------------------------------------------------------------------------
# the walk
# ---------------------------------------------------------------------------


def _push(buf, n_nodes, node, ec, do_push):
    """Masked append into the fused [B, M, 2] (node, ec) buffer.

    One drop-mode scatter, no gathers: lanes not pushing get an
    out-of-range slot that the scatter drops."""
    B, M, _ = buf.shape
    rows = jnp.arange(B)
    ok = do_push & (n_nodes < M)
    slot = jnp.where(ok, jnp.clip(n_nodes, 0, M - 1), M)
    val = jnp.stack([node, ec], axis=-1)
    buf = buf.at[rows, slot].set(val, mode="drop")
    return buf, n_nodes + do_push.astype(jnp.int32)


def _compact_select(mask: jnp.ndarray, C: int):
    """First-C true lanes of [B] mask, in ascending lane order.

    Returns (idxc [C] int32 source lane ids, valid [C] bool, overflow [B]
    bool — true lanes beyond capacity).  One cumsum + one drop-mode
    scatter; fully deterministic, so TPU/CPU outputs stay identical."""
    B = mask.shape[0]
    order = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask & (order < C), order, C)
    idxc = jnp.zeros((C,), jnp.int32).at[slot].set(
        jnp.arange(B, dtype=jnp.int32), mode="drop"
    )
    n_sel = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), C)
    valid = jnp.arange(C, dtype=jnp.int32) < n_sel
    overflow = mask & (order >= C)
    return idxc, valid, overflow


def _compact_cap(B: int, frac: float) -> int:
    """Static compact-buffer capacity: ceil(B * frac) rounded up to 8."""
    import math

    c = -(-math.ceil(B * frac) // 8) * 8
    return max(8, min(B, c))


def _base_at(meta: MapMeta, win_words: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Base code at position t of a packed ascending window (dense select)."""
    out = jnp.zeros_like(t)
    tw = (t >> 4).astype(jnp.int32)
    sh = ((t & 15) * 2).astype(jnp.uint32)
    for w in range(win_words.shape[1]):
        v = ((win_words[:, w] >> sh) & jnp.uint32(3)).astype(jnp.int32)
        out = jnp.where(tw == w, v, out)
    return out


def map_batch_packed(meta: MapMeta, idx: DeviceIndex, packed, lens) -> MapResult:
    """Map a batch of 2-bit-packed reads (the production transfer path)."""
    reads = unpack_reads(packed, meta.read_len)
    lens = lens.astype(jnp.int32)
    nh3, has_tbl, seed_over = _seed_tables(meta, idx, reads, lens)
    return _walk(meta, idx, packed, reads, lens, nh3,
                 has_tbl=has_tbl, seed_over=seed_over)


def map_batch(meta: MapMeta, idx: DeviceIndex, reads, lens) -> MapResult:
    """Map a [B, L] batch of unpacked int codes."""
    reads = reads.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    packed = pack_reads_device(reads)
    nh3, has_tbl, seed_over = _seed_tables(meta, idx, reads, lens)
    return _walk(meta, idx, packed, reads, lens, nh3,
                 has_tbl=has_tbl, seed_over=seed_over)


def map_batch_with_seeds(
    meta: MapMeta, idx: DeviceIndex, reads, lens, nh3,
    fetch=None, cond_all=None,
) -> MapResult:
    """Walk + EC given a precomputed fused next-hit table (k-mer-
    partitioned mode; nh3 from next_hit_table).

    fetch/cond_all: graph-sharded walk hooks (see _walk)."""
    reads = reads.astype(jnp.int32)
    packed = pack_reads_device(reads)
    return _walk(meta, idx, packed, reads, lens.astype(jnp.int32),
                 nh3, fetch=fetch, cond_all=cond_all)


def pack_reads_device(reads: jnp.ndarray) -> jnp.ndarray:
    """[B, L] int codes -> [B, ceil(L/16)] uint32 (device-side)."""
    B, L = reads.shape
    nw = (L + 15) // 16
    pad = nw * 16 - L
    r = reads.astype(jnp.uint32)
    if pad:
        r = jnp.concatenate([r, jnp.zeros((B, pad), jnp.uint32)], axis=1)
    r = r.reshape(B, nw, 16)
    acc = jnp.zeros((B, nw), jnp.uint32)
    for i in range(16):
        acc = acc | (r[:, :, i] << jnp.uint32(2 * i))
    return acc


def _walk(meta, idx, packed, reads, lens, nh3,
          fetch=None, cond_all=None, has_tbl=None, seed_over=None) -> MapResult:
    """The batched graph walk.

    fetch(node, delta, want_win) -> (node_row [B, 12], window [B, cmp_words]
    or None) abstracts the per-iteration graph access: the replicated
    default gathers locally; the graph-sharded mode routes requests to
    owner shards via all_to_all (parallel/sharded_index.py).  cond_all
    reduces the while-loop liveness flag across the mesh — the routed
    fetch places collectives inside the loop bodies, so every device must
    agree on the trip count (a psum-OR).  The reduced flag is carried in
    the loop STATE (computed at the end of each body, where collectives
    are legal), so the loop cond itself stays collective-free.
    """
    B, L = reads.shape
    k = meta.k
    P = meta.n_positions
    allowed = meta.allowed_mismatches
    fw_bases = read_front_words(meta) * 16
    rp = pad_packed_reads(meta, packed)

    # the fused [B, P, 3] next-hit table (next_hit_table): row p carries
    # (q, node@q, off@q) — the initial seed reads row 0 directly and each
    # in-loop re-seed is ONE 3-wide gather
    if P > 0:
        q0 = nh3[:, 0, 0]
        node0 = nh3[:, 0, 1]
        off0 = nh3[:, 0, 2]
    else:
        q0 = jnp.full((B,), 0, jnp.int32)
        node0 = jnp.full((B,), -1, jnp.int32)
        off0 = jnp.full((B,), -1, jnp.int32)
    seeded = q0 < jnp.int32(P)
    if seed_over is not None:
        # miss-at-0 lanes beyond the two-tier seed capacity: unprobed ->
        # inactive here, exact host fallback via the -3 marker below
        seeded = seeded & ~seed_over

    cov = jnp.zeros(B, jnp.int32)
    mm = jnp.zeros(B, jnp.int32)
    buf = jnp.full((B, meta.max_nodes, 2), -1, jnp.int32)  # (node, ec)
    n_nodes = jnp.zeros(B, jnp.int32)

    global_mode = cond_all is not None

    if fetch is None:

        def fetch(n, delta, want_win):
            r = jnp.take(idx.node_row, jnp.clip(n, 0, None), axis=0)
            win = (
                _extract_pool_window(meta, idx, r[:, 0] + delta)
                if want_win
                else None
            )
            return r, win

    # left-extension gate: kmer_pos >= (LEFT_EXTEND_FRACTION * L) as usize
    thresh = jnp.floor(
        jnp.float32(meta.left_extend_fraction) * lens.astype(jnp.float32)
    ).astype(jnp.int32)

    # ---- left extension (src/pseudoaligner.rs:124-205) ----
    lcap = meta.max_left_iters

    def l_cond(s):
        alive = s["galive"] if global_mode else jnp.any(s["active"])
        if lcap > 0:
            return alive & (s["it"] < lcap)
        return alive

    def make_l_body(rp_):
        def l_body(s):
            act = s["active"]
            lnode = s["node"]
            pko = s["pko"]
            last_pos = s["last_pos"]
            Bc = act.shape[0]
            maxm = jnp.minimum(last_pos + 1, pko + 1)
            # ref window: base (nstart + pko - j); extract ascending from
            # (nstart + pko - (L-1)) then reverse
            nrow, ref_win = fetch(lnode, pko - (L - 1), True)
            # read window: base (last_pos - j) + front pad; ascending from
            # last_pos - (L-1) + fw
            read_q = last_pos - (L - 1) + fw_bases
            read_win = _extract_read_window(meta, rp_, read_q)
            mmf = _mismatch_bits(meta, ref_win, read_win)
            mmf = mmf[:, ::-1]  # out[j] = base (q - j)
            matched, mm_add, prem = _segment_math(meta, mmf, maxm, allowed)
            cov2 = jnp.where(act, s["cov"] + matched, s["cov"])
            mm2 = jnp.where(act, s["mm"] + mm_add, s["mm"])
            stop = (last_pos + 1 - matched == 0) | prem
            lp2 = last_pos - matched
            # next base read[lp2] = ascending-window position L-1-matched
            nb = _base_at(meta, read_win, jnp.clip(L - 1 - matched, 0, L - 1))
            exts = nrow[:, 2]
            has = ((exts >> (4 + nb)) & 1) == 1
            follow = act & ~stop & has
            # l_edge at columns 8..11 (dense 4-way select, no gather)
            new_node = jnp.full((Bc,), -1, jnp.int32)
            for b4 in range(4):
                new_node = jnp.where(nb == b4, nrow[:, 8 + b4], new_node)
            new_row, _ = fetch(new_node, 0, False)
            nbuf, ncnt = _push(
                s["buf"], s["n_nodes"], new_node, new_row[:, 3], follow
            )
            new_pko = new_row[:, 1] - k
            out = {
                "active": follow,
                "node": jnp.where(follow, new_node, lnode),
                "pko": jnp.where(follow, new_pko, pko),
                "last_pos": jnp.where(act, lp2, last_pos),
                "cov": cov2,
                "mm": mm2,
                "buf": nbuf,
                "n_nodes": ncnt,
                "it": s["it"] + 1,
            }
            if global_mode:
                out["galive"] = cond_all(jnp.any(out["active"]))
            return out

        return l_body

    l_active0 = seeded & (q0 >= thresh)
    unroll = max(1, meta.walk_unroll)
    # lane compaction is legal only when the loop body is collective-free
    # and the -3 fallback channel exists for (rare) capacity overflow
    can_tier = meta.distinct_cap > 0 and not global_mode
    use_ltier = can_tier and meta.left_compact > 0 and lcap > 0

    def _unrolled(body):
        if unroll == 1:
            return body

        def grouped(s):
            for _ in range(unroll):
                s = body(s)
            return s

        return grouped

    def _run(cond, body, state, niters):
        """Run a capped walk loop: straight-line (masked) when allowed —
        each while_loop iteration pays ~1.2ms fixed cond/sync cost on
        this backend (PERF.md) and serving caps rarely exit early."""
        if meta.walk_straightline and niters > 0 and not global_mode:
            for _ in range(-(-niters // unroll)):
                state = body(state)
            return state
        return jax.lax.while_loop(cond, body, state)

    if use_ltier:
        # run the left loop on a compacted buffer of just the gated lanes
        Cl = _compact_cap(B, meta.left_compact)
        idxl, validl, l_over = _compact_select(l_active0, Cl)
        st = {
            "active": validl,
            "node": jnp.take(node0, idxl),
            "pko": jnp.take(jnp.where(off0 > 0, off0 - 1, 0), idxl),
            "last_pos": jnp.take(q0, idxl) - 1,
            "cov": jnp.zeros(Cl, jnp.int32),
            "mm": jnp.zeros(Cl, jnp.int32),
            "buf": jnp.full((Cl, meta.max_nodes, 2), -1, jnp.int32),
            "n_nodes": jnp.zeros(Cl, jnp.int32),
            "it": jnp.int32(0),
        }
        rp_l = jnp.take(rp, idxl, axis=0)
        st = _run(l_cond, _unrolled(make_l_body(rp_l)), st, lcap)
        tgt = jnp.where(validl, idxl, B)  # dropped for invalid slots
        l_state = {
            "cov": cov.at[tgt].set(st["cov"], mode="drop"),
            "mm": mm.at[tgt].set(st["mm"], mode="drop"),
            "buf": buf.at[tgt].set(st["buf"], mode="drop"),
            "n_nodes": n_nodes.at[tgt].set(st["n_nodes"], mode="drop"),
        }
        l_capped = (
            jnp.zeros((B,), bool).at[tgt].set(st["active"], mode="drop")
            | l_over
        )
    else:
        l_state = {
            "active": l_active0,
            "node": node0,
            "pko": jnp.where(off0 > 0, off0 - 1, 0),
            "last_pos": q0 - 1,
            "cov": cov,
            "mm": mm,
            "buf": buf,
            "n_nodes": n_nodes,
            "it": jnp.int32(0),
        }
        if global_mode:
            l_state["galive"] = cond_all(jnp.any(l_state["active"]))
        l_state = _run(l_cond, _unrolled(make_l_body(rp)), l_state, lcap)
        # lanes whose left chain was cut by the cap join the fallback set
        l_capped = (
            l_state["active"] if lcap > 0 else jnp.zeros((B,), bool)
        )

    # ---- forward walk (src/pseudoaligner.rs:208-302) ----
    cap = meta.max_walk_iters

    def f_cond(s):
        alive = s["galive"] if global_mode else jnp.any(s["active"])
        if cap > 0:
            return alive & (s["it"] < cap)
        return alive

    lazy = meta.lazy_seeds and meta.seed_index in ("cuckoo", "bucket1")

    def make_f_body(rp_, lens_, nh3_, has_tbl_=None, skip_seek=False):
        # skip_seek elides the unconditional in-loop seek probe (18
        # elements x B of gathers); ONLY valid for the first iteration,
        # where no lane can be in seek mode yet
        rows_ = jnp.arange(rp_.shape[0])

        def f_body(s):
            seeking = s["seeking"]
            act = s["active"] & ~seeking  # lanes in walk mode this iteration
            fnode = jnp.clip(s["node"], 0, None)
            koff = s["koff"]
            kpos = s["kpos"] + k
            Bc = act.shape[0]
            cov2 = jnp.where(act, s["cov"] + k, s["cov"])
            ref_off = koff + k
            nrow, ref_win = fetch(fnode, ref_off, True)
            nbuf, ncnt = _push(s["buf"], s["n_nodes"], fnode, nrow[:, 3], act)

            nlen, exts = nrow[:, 1], nrow[:, 2]
            informative = nlen - ref_off
            remaining = lens_ - kpos
            maxm = jnp.maximum(jnp.minimum(remaining, informative), 0)
            read_win = _extract_read_window(meta, rp_, kpos + fw_bases)
            mmf = _mismatch_bits(meta, ref_win, read_win)
            matched, mm_add, prem = _segment_math(meta, mmf, maxm, allowed)
            kpos = kpos + matched
            cov2 = jnp.where(act, cov2 + matched, cov2)
            mm2 = jnp.where(act, s["mm"] + mm_add, s["mm"])

            at_end = kpos >= lens_
            # next base read[kpos+matched] = window position `matched`
            nb = _base_at(meta, read_win, jnp.clip(matched, 0, L - 1))
            hasr = ~prem & (((exts >> nb) & 1) == 1)
            follow = act & ~at_end & hasr
            # r_edge at columns 4..7 (dense 4-way select, no gather)
            nxt_node = jnp.full((Bc,), -1, jnp.int32)
            for b4 in range(4):
                nxt_node = jnp.where(nb == b4, nrow[:, 4 + b4], nxt_node)

            # re-seed path (src/pseudoaligner.rs:285-299): residue-0
            # positions resolve via the precomputed next-hit table; in lazy
            # mode the other residues enter seek mode and probe in-loop
            can_seek = act & ~at_end & ~hasr & (kpos <= lens_ - k)
            if lazy:
                on_grid = (kpos % 3) == 0
                if has_tbl_ is not None:
                    # two-tier seeds: lanes without complete next-hit
                    # rows re-seed through the seek probe instead
                    on_grid = on_grid & has_tbl_
                tbl = can_seek & on_grid
                enter_seek = can_seek & ~on_grid
            else:
                tbl = can_seek
                enter_seek = jnp.zeros_like(can_seek)
            trip = nh3_[rows_, jnp.clip(kpos, 0, P - 1)]  # fused (q,node,off)
            q = trip[:, 0]
            found = tbl & (q < P)
            rs_node = trip[:, 1]
            rs_off = trip[:, 2]

            node2 = jnp.where(
                follow, nxt_node, jnp.where(found, rs_node, s["node"])
            )
            koff2 = jnp.where(follow, 0, jnp.where(found, rs_off, koff))
            kpos2 = jnp.where(
                follow, kpos - (k - 1), jnp.where(found, q, kpos)
            )
            cov2 = jnp.where(follow, cov2 - (k - 1), cov2)
            active2 = follow | found | enter_seek
            seeking2 = enter_seek

            if lazy and not skip_seek:
                # seek lanes: one exact probe at their current position
                skp = s["kpos"]
                kmw = _kmer_at(meta, rp_, jnp.clip(skp, 0, L - k))
                pn, po = seed_probe(meta, idx, kmw)
                hit = seeking & (pn >= 0)
                miss = seeking & (pn < 0)
                skp_next = skp + 3
                keep_seeking = miss & (skp_next <= lens_ - k)
                node2 = jnp.where(hit, pn, node2)
                koff2 = jnp.where(hit, po, koff2)
                kpos2 = jnp.where(
                    seeking, jnp.where(hit, skp, skp_next), kpos2
                )
                active2 = active2 | hit | keep_seeking
                seeking2 = seeking2 | keep_seeking

            out = {
                "active": active2,
                "seeking": seeking2,
                "node": node2,
                "koff": koff2,
                "kpos": kpos2,
                "cov": cov2,
                "mm": mm2,
                "buf": nbuf,
                "n_nodes": ncnt,
                "it": s["it"] + 1,
            }
            if global_mode:
                out["galive"] = cond_all(jnp.any(out["active"]))
            return out

        return f_body

    f_state = {
        "active": seeded,
        "seeking": jnp.zeros_like(seeded),
        "node": node0,
        "koff": off0,
        "kpos": q0,
        "cov": l_state["cov"],
        "mm": l_state["mm"],
        "buf": l_state["buf"],
        "n_nodes": l_state["n_nodes"],
        "it": jnp.int32(0),
    }
    wsplit = meta.walk_split
    use_wtier = (
        can_tier and wsplit > 0 and 0 < meta.walk_compact
        and cap > 0 and wsplit < cap
    )
    if global_mode:
        f_state["galive"] = cond_all(jnp.any(f_state["active"]))

    if use_wtier:
        # stage 1: first walk_split iterations at full B (most lanes
        # finish here — mean visited-node count ~1.3 on the bundled data)
        def f_cond1(s):
            return jnp.any(s["active"]) & (s["it"] < wsplit)

        f1 = jax.lax.while_loop(
            f_cond1, _unrolled(make_f_body(rp, lens, nh3, has_tbl)), f_state
        )
        # stage 2: compact the still-active tail and finish it at Cw
        Cw = _compact_cap(B, meta.walk_compact)
        idxw, validw, w_over = _compact_select(f1["active"], Cw)
        st2 = {
            "active": validw,
            "seeking": jnp.take(f1["seeking"], idxw) & validw,
            "node": jnp.take(f1["node"], idxw),
            "koff": jnp.take(f1["koff"], idxw),
            "kpos": jnp.take(f1["kpos"], idxw),
            "cov": jnp.take(f1["cov"], idxw),
            "mm": jnp.take(f1["mm"], idxw),
            "buf": jnp.take(f1["buf"], idxw, axis=0),
            "n_nodes": jnp.take(f1["n_nodes"], idxw),
            "it": f1["it"],
        }
        st2 = jax.lax.while_loop(
            f_cond,
            _unrolled(
                make_f_body(
                    jnp.take(rp, idxw, axis=0),
                    jnp.take(lens, idxw),
                    jnp.take(nh3, idxw, axis=0),
                    None if has_tbl is None else jnp.take(has_tbl, idxw),
                )
            ),
            st2,
        )
        tgtw = jnp.where(validw, idxw, B)
        f_state = dict(
            f1,
            cov=f1["cov"].at[tgtw].set(st2["cov"], mode="drop"),
            mm=f1["mm"].at[tgtw].set(st2["mm"], mode="drop"),
            buf=f1["buf"].at[tgtw].set(st2["buf"], mode="drop"),
            n_nodes=f1["n_nodes"].at[tgtw].set(st2["n_nodes"], mode="drop"),
        )
        capped = (
            jnp.zeros((B,), bool).at[tgtw].set(st2["active"], mode="drop")
            | w_over
        )
    else:
        body = _unrolled(make_f_body(rp, lens, nh3, has_tbl))
        if lazy and unroll == 1 and cap != 1 and not global_mode:
            # peel iteration 1 with the dead seek probe elided (seeking
            # starts all-False; lanes can only ENTER seek during it)
            f_state = make_f_body(rp, lens, nh3, has_tbl, skip_seek=True)(
                f_state
            )
            f_state = _run(
                f_cond, body, f_state, cap - 1 if cap > 0 else 0
            )
        else:
            f_state = _run(f_cond, body, f_state, cap)
        # lanes cut off by the iteration cap need the exact fallback pass
        capped = f_state["active"] if cap > 0 else jnp.zeros((B,), bool)
    capped = capped | l_capped
    if seed_over is not None:
        capped = capped | seed_over

    buf = f_state["buf"]
    nodes_buf = buf[:, :, 0]
    ec_buf = buf[:, :, 1]
    n_nodes = f_state["n_nodes"]
    # lanes that pushed past the node buffer lost visits: send them to the
    # exact fallback too (lets serving shrink max_nodes to the cap budget
    # the wcap + lcap push bound without any silent-truncation hazard)
    capped = capped | (n_nodes > meta.max_nodes)
    mapped = n_nodes > 0

    # ---- compact serving output: EC ids per read ----
    if meta.distinct_cap > 0:
        DC = meta.distinct_cap
        v = ec_buf
        # Run-length compact the visited-class ids with dense ops (an
        # in-graph sort of the loop buffer measured ~60ms; see PERF.md):
        # consecutive equal ids collapse, which covers the dominant
        # same-class node chains; the host set-dedups the rest per unique
        # signature.  Lanes with more than DC runs carry the -2 marker and
        # get an exact host re-map (rare: p99 distinct classes ~4).
        prev = jnp.concatenate(
            [jnp.full((B, 1), -1, jnp.int32), v[:, :-1]], axis=1
        )
        newrun = (v >= 0) & (v != prev)
        pos = jnp.cumsum(newrun.astype(jnp.int32), axis=1) - 1
        # single drop-mode scatter compacts run heads into DC slots (a
        # per-slot select loop is ~30 unfused tiny kernels at ~1.3ms
        # dispatch each on this backend; see PERF.md)
        M = v.shape[1]
        rows2 = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))
        slot = jnp.where(newrun, jnp.minimum(pos, DC), DC)
        out = jnp.full((B, DC + 1), -1, jnp.int32)
        out = out.at[rows2, slot].set(v, mode="drop")
        extra = jnp.any(newrun & (pos >= DC), axis=1)
        ec_distinct = out[:, :DC]
        ec_distinct = ec_distinct.at[:, DC - 1].set(
            jnp.where(extra, jnp.int32(-2), ec_distinct[:, DC - 1])
        )
        # iteration-capped lanes: everything (EC, coverage) comes from the
        # exact fallback re-run
        ec_distinct = ec_distinct.at[:, DC - 1].set(
            jnp.where(capped, jnp.int32(-3), ec_distinct[:, DC - 1])
        )
        if meta.ec_out_16:
            ec_distinct = ec_distinct.astype(jnp.int16)
        cov_out = f_state["cov"]
        if meta.cov_out_8:
            cov_out = cov_out.astype(jnp.uint8)
        return MapResult(
            mapped=mapped,
            coverage=cov_out,
            mismatches=f_state["mm"],
            nodes=jnp.zeros((B, 0), jnp.int32),
            n_nodes=n_nodes,
            ec_bits=jnp.zeros((B, 0), jnp.uint32),
            ec_distinct=ec_distinct,
        )

    # ---- EC intersection via bitsets (small transcriptomes) ----
    # Intersection is idempotent, so AND only each lane's *distinct* EC ids
    # (mean visited-node count is ~1.3, p99 ~4 on the bundled workload):
    # sort + unique-compact the [B, M] id buffer densely, then CAP unrolled
    # row gathers; a while-loop tail covers the rare lanes with more
    # distinct classes than CAP.
    if meta.tx_words > 0:
        TW = meta.tx_words
        SENT = jnp.int32(2**31 - 1)
        vals = jnp.sort(jnp.where(ec_buf >= 0, ec_buf, SENT), axis=1)
        prev = jnp.concatenate(
            [jnp.full((B, 1), -1, jnp.int32), vals[:, :-1]], axis=1
        )
        distinct = (vals != prev) & (vals != SENT)
        pos = jnp.cumsum(distinct.astype(jnp.int32), axis=1) - 1
        n_distinct = jnp.sum(distinct.astype(jnp.int32), axis=1)

        def ec_slice(j, bits):
            sel = distinct & (pos == j)
            ecid = jnp.sum(jnp.where(sel, vals, 0), axis=1)
            have = jnp.any(sel, axis=1)
            row = jnp.take(idx.ec_bits, ecid, axis=0)
            return bits & jnp.where(have[:, None], row, jnp.uint32(0xFFFFFFFF))

        CAP = min(4, meta.max_nodes)
        bits = jnp.full((B, TW), 0xFFFFFFFF, jnp.uint32)
        for j in range(CAP):
            bits = ec_slice(j, bits)

        def t_cond(c):
            j, _ = c
            return j < jnp.max(n_distinct)

        def t_body(c):
            j, b = c
            return j + 1, ec_slice(j, b)

        _, bits = jax.lax.while_loop(t_cond, t_body, (jnp.int32(CAP), bits))
        ec_bits = jnp.where(mapped[:, None], bits, jnp.uint32(0))
    else:
        ec_bits = jnp.zeros((B, 0), jnp.uint32)

    return MapResult(
        mapped=mapped,
        coverage=f_state["cov"],
        mismatches=f_state["mm"],
        nodes=nodes_buf,
        n_nodes=n_nodes,
        ec_bits=ec_bits,
        ec_distinct=jnp.zeros((B, 0), jnp.int32),
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


def _pack_pool_rows(seq_pool: np.ndarray, pad_front: int, pad_back: int,
                    stride: int = 0) -> np.ndarray:
    """uint8 base codes -> [R, 8] uint32 rows (128 bases/row), zero padded.

    stride > 0 builds OVERLAPPING rows starting every `stride` bases
    (stride a multiple of 16): with stride = 128 - 16*(cmp_words+1),
    every compare window fits in ONE row — the window fetch gathers 8
    elements per lane instead of 16 (gathers price per element consumed;
    PERF.md).  Memory cost: x(128/stride) on the (small) packed pool."""
    from .. import dna

    total = pad_front + len(seq_pool) + pad_back
    total = (total + 127) // 128 * 128
    codes = np.zeros(total, dtype=np.uint8)
    codes[pad_front : pad_front + len(seq_pool)] = seq_pool
    words = dna.pack_codes_2bit(codes)
    if stride:
        assert stride % 16 == 0 and 16 <= stride < 128
        sw = stride // 16
        flat = np.ascontiguousarray(words)
        win = np.lib.stride_tricks.sliding_window_view(flat, 8)[::sw]
        return np.ascontiguousarray(win)
    return words.reshape(-1, 8)


_DEVCACHE_VERSION = 1


def _devcache_path(image, pool_pad, pool_stride, seed_index, tx_words):
    """Disk-cache location for the derived device-image arrays, or None.

    The pool packing + cuckoo placement + node-row fusion cost ~25-60s
    at GENCODE scale and are pure functions of (index file, these shape
    knobs) — the reference's build/serve decoupling
    (src/bin/pseudoaligner.rs:114,135) applied to the derived arrays
    (VERDICT r3 #8: scale-row serve init).  Keyed on the index file's
    (path, size, mtime) identity captured at load_index time."""
    import hashlib
    import json as _json

    ident = getattr(image, "source_ident", None)
    if ident is None or os.environ.get("PSEUDOALIGNER_DEVCACHE") == "0":
        return None
    key = _json.dumps([_DEVCACHE_VERSION, list(ident), pool_pad,
                       pool_stride, seed_index, tx_words])
    h = hashlib.sha1(key.encode()).hexdigest()[:16]
    return f"{ident[0]}.dev-{h}.npz"


def _derived_knobs(image, config: AlignerConfig, warn: bool = False):
    """(pool_pad, pool_stride, tx_words) from (image, config) — the
    shape knobs that key BOTH the devcache and the packed sidecar.  ONE
    derivation shared by device_index_from_image and _packcache_path so
    the cache keys cannot silently drift from the build (review r5)."""
    use_bitset = len(image.tx_names) <= config.bitset_tx_threshold
    tx_words = (len(image.tx_names) + 31) // 32 if use_bitset else 0
    L = config.max_read_len
    pool_pad = ((L + 127) // 128 + 1) * 128
    cmp_words = (L + 15) // 16 + 1
    # pool_overlap=None (the default) auto-engages iff the compare
    # window fits one 128-base row (max_read_len <= 80) — a too-wide
    # window falls back silently; the warning fires only on an
    # EXPLICIT pool_overlap=True request that cannot be honored
    want_overlap = (config.pool_overlap if config.pool_overlap is not None
                    else L <= 80)
    pool_stride = 128 - 16 * (cmp_words + 1) if want_overlap else 0
    if pool_stride < 16:
        if warn and config.pool_overlap:
            import logging

            logging.getLogger(__name__).warning(
                "pool_overlap requested but max_read_len=%d needs a "
                "compare window wider than one 128-base row (supported "
                "for max_read_len <= 80); using the legacy 2-row fetch",
                L,
            )
        pool_stride = 0  # window wider than a row: legacy 2-row fetch
    return pool_pad, pool_stride, tx_words


def device_index_from_image(image, config: AlignerConfig):
    """IndexImage -> (DeviceIndex of numpy arrays, MapMeta)."""
    pool_pad, pool_stride, tx_words = _derived_knobs(
        image, config, warn=True)

    W = image.kmer_keys.shape[1]
    cache_path = _devcache_path(
        image, pool_pad, pool_stride, config.seed_index, tx_words
    )
    cached = None
    if cache_path is not None and os.path.exists(cache_path):
        try:
            with np.load(cache_path) as z:
                cached = {k: z[k] for k in z.files}
        except Exception:
            cached = None
    if cached is not None:
        ec_bits = cached["ec_bits"]
        pool_rows = cached["pool_rows"]
        node_row = cached["node_row"]
        cuckoo_rows = cached["cuckoo_rows"]
        # pre-r5 caches stored [S, 2]; the serving layout is flat pairs
        cuckoo_vals = cached["cuckoo_vals"].reshape(-1)
        cuckoo_mask = int(cached["scalars"][0])
        bucket_seed = int(cached["scalars"][1])
        ones_node = int(cached["scalars"][2])
        ones_off = int(cached["scalars"][3])
    else:
        ec_bits = (
            build_ec_bitsets(image.ec_offsets, image.ec_txs,
                             len(image.tx_names))
            if tx_words > 0
            else np.zeros((1, 0), np.uint32)
        )
        pool_rows = _pack_pool_rows(
            image.seq_pool, pool_pad, pool_pad, stride=pool_stride
        )

        N = image.n_nodes
        node_row = np.zeros((N, 12), dtype=np.int32)
        node_row[:, 0] = image.node_start.astype(np.int64) + pool_pad
        node_row[:, 1] = image.node_len
        node_row[:, 2] = image.node_exts
        node_row[:, 3] = image.node_ec
        # r_edge before l_edge: the forward walk consumes columns 0..7 as
        # a contiguous prefix, letting XLA narrow its per-iteration
        # node-row gather to 8 of the 12 words; the (lane-compacted) left
        # loop reads the l_edge tail at 8..11
        node_row[:, 4:8] = image.r_edge
        node_row[:, 8:12] = image.l_edge

        bucket_seed = 0
        cuckoo_vals = np.zeros(2, np.uint32)
        ones_node = ones_off = -1
        if config.seed_index == "cuckoo":
            ck = build_cuckoo_fast(
                image.kmer_keys, image.kmer_node, image.kmer_offset
            )
            cuckoo_mask = ck.mask
            # split the fused [nb, SLOTS*(W+2)] rows into keys-only rows
            # (aligned SLOTS*W width; empty slots -> all-ones keys) and a
            # flat values array: the probe consumes per element and row
            # widths quantize to powers of two (PERF.md)
            nb = ck.buckets.shape[0]
            full = ck.buckets.reshape(nb, CK_SLOTS, W + 2)
            keys = full[:, :, :W].copy()
            empty = full[:, :, W] == CK_EMPTY
            keys[empty] = 0xFFFFFFFF
            cuckoo_rows = np.ascontiguousarray(keys.reshape(nb, CK_SLOTS * W))
            cuckoo_vals = np.ascontiguousarray(
                full[:, :, W : W + 2].reshape(-1)  # flat (node, off) pairs
            )
            if image.k * 2 == 32 * W:
                # the all-ones k-mer is real at word-filling k and
                # collides with the empty-slot pattern: its payload rides
                # in meta
                hit = np.all(
                    image.kmer_keys == np.uint32(0xFFFFFFFF), axis=1
                ).nonzero()[0]
                if len(hit):
                    ones_node = int(image.kmer_node[hit[0]])
                    ones_off = int(image.kmer_offset[hit[0]])
        elif config.seed_index == "bucket1":
            from ..index.cuckoo import build_bucket1

            cuckoo_rows, cuckoo_mask, bucket_seed = build_bucket1(
                image.kmer_keys, image.kmer_node, image.kmer_offset
            )
        else:
            cuckoo_rows = np.zeros((1, CK_SLOTS * W), np.uint32)
            cuckoo_mask = 0
        if cache_path is not None:
            try:
                # pid-unique tmp: concurrent processes (multihost) on a
                # cold cache must not interleave writes into one file
                tmp = f"{cache_path}.tmp{os.getpid()}.npz"
                np.savez(tmp, ec_bits=ec_bits, pool_rows=pool_rows,
                         node_row=node_row, cuckoo_rows=cuckoo_rows,
                         cuckoo_vals=cuckoo_vals,
                         scalars=np.array(
                             [cuckoo_mask, bucket_seed, ones_node,
                              ones_off], np.int64))
                os.replace(tmp, cache_path)
            except Exception:
                pass  # cache write is best-effort (read-only fs, ...)

    dev = DeviceIndex(
        pool_rows=pool_rows,
        node_row=node_row,
        cuckoo=cuckoo_rows,
        cuckoo_vals=cuckoo_vals,
        mphf_bits=image.mphf.bits,
        mphf_ranks=image.mphf.ranks,
        kmer_keys=image.kmer_keys,
        kmer_node=image.kmer_node.astype(np.int32),
        kmer_offset=image.kmer_offset.astype(np.int32),
        ec_bits=ec_bits,
    )
    meta = _make_meta(image, config, tx_words, cuckoo_mask, bucket_seed,
                      ones_node, ones_off, pool_pad, pool_stride)
    return dev, meta


def _make_meta(image, config, tx_words, cuckoo_mask, bucket_seed,
               ones_node, ones_off, pool_pad, pool_stride) -> MapMeta:
    """MapMeta from (image, config) + the build-derived scalars — shared
    by device_index_from_image and the packed-sidecar serving loader so
    the two paths cannot drift."""
    return MapMeta(
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
        seed_index=config.seed_index,
        cuckoo_mask=cuckoo_mask,
        bucket_seed=bucket_seed,
        ones_node=ones_node,
        ones_off=ones_off,
        pool_pad=pool_pad,
        pool_stride=pool_stride,
        distinct_cap=config.distinct_cap,
        lazy_seeds=(
            config.lazy_seeds
            and config.seed_index in ("cuckoo", "bucket1")
        ),
        # the cap needs the compact -3 marker channel for exact fallback
        max_walk_iters=(
            config.max_walk_iters if config.distinct_cap > 0 else 0
        ),
        max_left_iters=(
            config.max_left_iters if config.distinct_cap > 0 else 0
        ),
        walk_unroll=config.walk_unroll,
        walk_straightline=config.walk_straightline,
        left_compact=config.left_compact,
        walk_split=config.walk_split,
        walk_compact=config.walk_compact,
        seed_compact=config.seed_compact,
        ec_out_16=config.distinct_cap > 0 and image.n_ecs < 2**15 - 4,
        cov_out_8=config.distinct_cap > 0 and config.max_read_len <= 255,
    )


@functools.lru_cache(maxsize=64)
def _pack_unpack_jit(pack_keys, pack_vals, pack_pool, node_bits, off_bits,
                     W, PB, S_pad, R, sw, G):
    """Memoized jitted on-device unpack for upload_device_index.

    ONE jit callable per static config: a fresh jax.jit wrapper per
    upload re-traced AND re-paid the backend's server-side program load
    every aligner construction (chip-measured ~25s of the packed arm —
    the unpack ops themselves run in ~1.3s at 33.5M slots, c22)."""
    # static column permutation: wide[r, 2m] = lo2d[r, m],
    # wide[r, 2m + 1] = hi2d[r, m] — flat order is then exactly the
    # (lo, hi) pair stream, i.e. the serving arrays' row-major layout
    perm = np.empty(2 * G, np.int32)
    perm[0::2] = np.arange(G)
    perm[1::2] = G + np.arange(G)

    def _interleave(lo2d, hi2d):
        return jnp.take(
            jnp.concatenate([lo2d, hi2d], axis=1), jnp.asarray(perm),
            axis=1)

    def _unpack(a):
        if pack_vals:
            vlo_d, vhi_d = a["vals_lo"], a["vals_hi"]
            nmask = jnp.uint32((1 << node_bits) - 1)
            node_f = vlo_d & nmask
            emp = node_f == nmask
            off = (vlo_d >> node_bits) | (
                vhi_d.astype(jnp.uint32) << (32 - node_bits))
            if off_bits < 32:
                off = off & jnp.uint32((1 << off_bits) - 1)
            node = jnp.where(emp, jnp.uint32(CK_EMPTY), node_f)
            off = jnp.where(emp, jnp.uint32(0), off)
            cuckoo_vals = _interleave(
                node.reshape(-1, G), off.reshape(-1, G)).reshape(-1)
        else:
            cuckoo_vals = a["cuckoo_vals"]
            emp = None
        if pack_keys:
            klo_d = a["keys_lo"]
            khi_d = jnp.zeros((S_pad,), jnp.uint32)
            for j in range(PB - 4):
                khi_d = khi_d | (
                    a["keys_hi"][:, j].astype(jnp.uint32) << (8 * j))
            khi_d = jnp.where(emp, jnp.uint32(0xFFFFFFFF), khi_d)
            cuckoo = _interleave(
                klo_d.reshape(-1, G), khi_d.reshape(-1, G)
            ).reshape(S_pad // CK_SLOTS, CK_SLOTS * W)
        else:
            cuckoo = a["cuckoo"]
        if pack_pool:
            R_pad = -(-R // 128) * 128
            r16 = jnp.arange(R_pad // 128)[:, None]
            c = jnp.arange(1024)[None, :]
            idx = (r16 * 128 + c // 8) * sw + (c % 8)
            pool_rows = jnp.take(  # clips OOB tail-row indices
                a["pool_flat"], idx, mode="clip").reshape(R_pad, 8)
        else:
            pool_rows = a["pool_rows"]
        return {"cuckoo": cuckoo, "cuckoo_vals": cuckoo_vals,
                "pool_rows": pool_rows}

    return jax.jit(_unpack, donate_argnums=0)


def upload_device_index(dev: DeviceIndex, meta: MapMeta, device=None,
                        sidecar_path=None) -> DeviceIndex:
    """device_put with H2D byte-packing for the big serving tables.

    The scale-row serve init is LINK-bound: ~537MB of cuckoo keys+values
    at ~28MB/s dominates it (PERF.md round 4).  Keys occupy only 2k bits
    of their 32*W-bit slots (40 of 64 at k=20) and (node, offset) values
    fit well under 64 bits, so transfer bit-packed arrays and unpack ON
    DEVICE once into the serving layout — the probe layout (split pow2
    keys-only rows + flat values, PERF.md gather pricing) is untouched,
    only the bytes on the link shrink (~31% at k=20).  The overlapping
    pool rows (pool_stride mode, 128/stride x redundancy) likewise ride
    as the non-overlapping flat words and re-window on device.
    Reference analog: the lean `NoKeyBoomHashMap` keeping no keys at all
    (src/build_index.rs:220) — here the keys stay (verification needs
    them) but ride the link compressed.

    Also: in cuckoo/bucket1 mode the mphf + raw key/value arrays are
    DEAD WEIGHT on the device (only the mphf-mode verified_lookup and
    the host-side diagnostics read them — ~432MB at 27M kmers, ~44% of
    the old upload) and ride as 1-element dummies.  batch_stats
    (ops/stats.py) needs a full DeviceIndex from
    device_index_from_image, not a serving upload.

    Bit-packing engages only for cuckoo-mode tables >= PA_PACK_UPLOAD_MIN
    bytes (default 128MB — the bundled index's ~2s setup should not pay a
    pack+unpack compile); PA_PACK_UPLOAD=0 disables, =1 forces (tests).
    """
    env = os.environ.get("PA_PACK_UPLOAD", "")
    if meta.seed_index in ("cuckoo", "bucket1") and env != "0":
        dev = dev._replace(**_probe_dummies(dev.kmer_keys.shape[1]))
    nb = dev.cuckoo.shape[0]
    if env == "0" or meta.seed_index != "cuckoo" or nb <= 1:
        return jax.device_put(dev, device)
    total_bytes = dev.cuckoo.nbytes + dev.cuckoo_vals.nbytes
    min_bytes = (0 if env == "1"
                 else int(os.environ.get("PA_PACK_UPLOAD_MIN", 128 << 20)))
    if total_bytes < min_bytes:
        return jax.device_put(dev, device)
    packed = _pack_serving_args(dev, meta)
    if packed is None:
        return jax.device_put(dev, device)
    args, cfg = packed
    if sidecar_path is not None:
        _write_packcache(sidecar_path, args, cfg, dev, meta)
    rest = {
        f: getattr(dev, f) for f in dev._fields
        if f not in ("cuckoo", "cuckoo_vals", "pool_rows")
    }
    return _put_and_unpack(args, cfg, rest, device)


def _probe_dummies(W_k: int) -> dict:
    """Zero-size stand-ins for the mphf/raw-key arrays (dead weight on
    device in cuckoo/bucket1 mode — ~432MB at 27M kmers).  Shape 0, not
    1: a genuine single-kmer index has kmer_keys shape (1, W), so a
    1-row sentinel would be indistinguishable from real data
    (ops/stats.py's guard — review r5)."""
    return dict(
        mphf_bits=np.zeros(0, np.uint32),
        mphf_ranks=np.zeros(0, np.uint32),
        kmer_keys=np.zeros((0, W_k), np.uint32),
        kmer_node=np.zeros(0, np.int32),
        kmer_offset=np.zeros(0, np.int32),
    )


def _pack_serving_args(dev: DeviceIndex, meta: MapMeta):
    """Host-side bit-pack of the big serving tables.

    Returns (args dict, cfg tuple) or None when no packing applies.
    cfg = (pack_keys, pack_vals, pack_pool, node_bits, off_bits, W, PB,
    S_pad, R, sw) — exactly _pack_unpack_jit's static signature minus G.
    """
    nb = dev.cuckoo.shape[0]
    W = dev.cuckoo.shape[1] // CK_SLOTS
    S = nb * CK_SLOTS
    if dev.cuckoo_vals.shape != (2 * S,):  # unexpected layout
        return None
    PB = (2 * meta.k + 7) // 8  # packed key bytes (40 bits -> 5 at k=20)
    vals = dev.cuckoo_vals  # flat (node, offset) pairs
    node_u = vals[0::2]
    is_empty = node_u == np.uint32(CK_EMPTY)
    # field widths from the ACTUAL maxima; empties ride as the all-ones
    # node field (the field max exceeds any real id by construction of
    # bit_length) and are restored to (EMPTY, 0) on device
    node_bits = max(1, int(dev.node_row.shape[0]).bit_length())
    offs = vals[1::2].astype(np.uint64)
    max_off = int(offs[~is_empty].max(initial=0))
    off_bits = max(1, int(max_off).bit_length())
    pack_vals = (node_bits <= 30 and off_bits <= 32
                 and node_bits + off_bits <= 46)
    # key packing rides the same wide-interleave unpack and is gated on
    # pack_vals (empties are detected from the packed node field); the
    # interleave trick wants exactly W == 2 low/high parts per slot
    pack_keys = pack_vals and W == 2 and PB < 4 * W
    sw = meta.pool_stride // 16
    pack_pool = sw > 0 and dev.pool_rows.shape[0] > 1
    if not (pack_keys or pack_vals or pack_pool):
        return None

    # TPU layout note (chip-measured OOM, round 5): inside a jit,
    # narrow-minor-dim temps ([S, 2], [nb, 8]) get (8, 128) tile padding
    # — a naive per-word stack blew 512MB of keys into a 20GB HLO temp.
    # The unpack therefore runs entirely on [*, 512/1024]-wide tiles:
    # slots pad up to a multiple of 512 (padded rows are UNREACHABLE —
    # the probe masks buckets with meta.cuckoo_mask, the value fetch
    # gathers by slot id < S, the pool fetch by in-pool offset), the
    # low/high halves interleave via a static 1024-column permutation,
    # and only the final reshape back to the serving shapes touches a
    # narrow layout (a single copy into the compact output buffer).
    G = 512
    S_pad = -(-S // G) * G
    args = {}
    if pack_vals:
        fmax = np.uint64((1 << node_bits) - 1)
        v = np.where(is_empty, fmax, node_u.astype(np.uint64)) | (
            np.where(is_empty, np.uint64(0), offs) << np.uint64(node_bits))
        vlo = np.full(S_pad, fmax & np.uint64(0xFFFFFFFF), np.uint32)
        vhi = np.full(S_pad, fmax >> np.uint64(32), np.uint16)
        vlo[:S] = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        vhi[:S] = (v >> np.uint64(32)).astype(np.uint16)
        args["vals_lo"], args["vals_hi"] = vlo, vhi
    else:
        args["cuckoo_vals"] = dev.cuckoo_vals
    if pack_keys:
        # first PB bytes of each slot's little-endian words ARE the key
        # (bits above 2k are zero); empty slots come through as all-ones
        # bytes and are widened back to the full all-ones words on
        # device (a packed all-ones key can be a REAL poly-T k-mer,
        # unlike the full 32W-bit all-ones pattern — the node-field
        # emptiness disambiguates)
        kb = np.ascontiguousarray(dev.cuckoo.reshape(S, W)).view(
            np.uint8).reshape(S, 4 * W)
        klo = np.full(S_pad, 0xFFFFFFFF, np.uint32)
        klo[:S] = kb[:, :4].copy().view(np.uint32).reshape(S)
        khi = np.full((S_pad, PB - 4), 0xFF, np.uint8)
        khi[:S] = kb[:, 4:PB]
        args["keys_lo"], args["keys_hi"] = klo, khi
    else:
        args["cuckoo"] = dev.cuckoo
    R = dev.pool_rows.shape[0]
    if pack_pool:
        pr = dev.pool_rows
        args["pool_flat"] = np.concatenate(
            [pr[:-1, :sw].reshape(-1), pr[-1]])
    else:
        args["pool_rows"] = dev.pool_rows
    return args, (pack_keys, pack_vals, pack_pool, node_bits, off_bits,
                  W, PB, S_pad, R, sw)


def _put_and_unpack(args: dict, cfg: tuple, rest: dict,
                    device=None) -> DeviceIndex:
    """device_put the packed args + run the memoized on-device unpack."""
    args_dev = jax.device_put(args, device)
    out = _pack_unpack_jit(*cfg, 512)(args_dev)
    rest_dev = jax.device_put(rest, device)
    return DeviceIndex(
        pool_rows=out["pool_rows"], node_row=rest_dev["node_row"],
        cuckoo=out["cuckoo"], cuckoo_vals=out["cuckoo_vals"],
        mphf_bits=rest_dev["mphf_bits"], mphf_ranks=rest_dev["mphf_ranks"],
        kmer_keys=rest_dev["kmer_keys"], kmer_node=rest_dev["kmer_node"],
        kmer_offset=rest_dev["kmer_offset"], ec_bits=rest_dev["ec_bits"],
    )


_PACKCACHE_VERSION = 1


class _PackGateMiss(Exception):
    """Sidecar exists but the size gate asks for the plain upload."""


def _packcache_path(image, config: AlignerConfig):
    """Disk location for the PACKED serving sidecar, or None.

    A sidecar hit skips the big devcache npz load AND the host re-pack
    at serve init (chip: ~6s of the 27M-kmer serve_init).  Keyed like
    _devcache_path on the index file identity + the shape knobs the
    packed arrays depend on."""
    import hashlib
    import json as _json

    ident = getattr(image, "source_ident", None)
    if ident is None or os.environ.get("PSEUDOALIGNER_DEVCACHE") == "0":
        return None
    pool_pad, pool_stride, tx_words = _derived_knobs(image, config)
    key = _json.dumps(["pack", _PACKCACHE_VERSION, list(ident), pool_pad,
                       pool_stride, config.seed_index, tx_words])
    h = hashlib.sha1(key.encode()).hexdigest()[:16]
    return f"{ident[0]}.pack-{h}.npz"


def _write_packcache(path, args, cfg, dev: DeviceIndex,
                     meta: MapMeta) -> None:
    """Best-effort atomic write of the packed serving sidecar."""
    try:
        tmp = f"{path}.tmp{os.getpid()}.npz"
        np.savez(
            tmp,
            pack_cfg=np.array([int(x) for x in cfg], np.int64),
            meta_scalars=np.array(
                [meta.cuckoo_mask, meta.bucket_seed, meta.ones_node,
                 meta.ones_off, meta.pool_pad, meta.pool_stride,
                 meta.tx_words], np.int64),
            node_row=dev.node_row, ec_bits=dev.ec_bits,
            **{f"arg_{k}": v for k, v in args.items()},
        )
        os.replace(tmp, path)
    except Exception:
        pass  # cache write is best-effort (read-only fs, ...)


def serving_device_index(image, config: AlignerConfig, device=None):
    """(device-resident DeviceIndex, MapMeta) for SERVING.

    Equivalent to device_index_from_image + upload_device_index (the
    tests pin equality), but a packed-sidecar hit feeds the upload
    directly from disk: no 546MB devcache npz load, no cuckoo
    reconstruction, no host re-pack — the serve-init path is then
    sidecar load + H2D of the packed bytes + the on-device unpack.
    """
    path = _packcache_path(image, config)
    env = os.environ.get("PA_PACK_UPLOAD", "")
    if path is not None and env != "0" and os.path.exists(path):
        try:
            with np.load(path) as z:
                data = {k: z[k] for k in z.files}
            cfg_raw = [int(x) for x in data["pack_cfg"]]
            cfg = (bool(cfg_raw[0]), bool(cfg_raw[1]), bool(cfg_raw[2]),
                   *cfg_raw[3:])
            # honor the PA_PACK_UPLOAD_MIN size gate on hits too — a
            # stale sidecar must not force the packed path when the
            # knob asks for the plain upload (review r5).  Estimated
            # from cfg: S_pad slots of W-word keys + 2-word values.
            if env != "1":
                min_bytes = int(os.environ.get(
                    "PA_PACK_UPLOAD_MIN", 128 << 20))
                W_, S_pad_ = cfg[5], cfg[7]
                if S_pad_ * (W_ + 2) * 4 < min_bytes:
                    raise _PackGateMiss()
            ms = [int(x) for x in data["meta_scalars"]]
            meta = _make_meta(image, config, tx_words=ms[6],
                              cuckoo_mask=ms[0], bucket_seed=ms[1],
                              ones_node=ms[2], ones_off=ms[3],
                              pool_pad=ms[4], pool_stride=ms[5])
            args = {k[4:]: v for k, v in data.items()
                    if k.startswith("arg_")}
            rest = dict(node_row=data["node_row"],
                        ec_bits=data["ec_bits"],
                        **_probe_dummies(image.kmer_keys.shape[1]))
            return _put_and_unpack(args, cfg, rest, device), meta
        except Exception:
            pass  # corrupt/stale sidecar: rebuild below
    dev, meta = device_index_from_image(image, config)
    out = upload_device_index(dev, meta, device, sidecar_path=path)
    return out, meta
