"""The Pseudoaligner model: index + batched TPU mapping engine.

TPU-native equivalent of the `Pseudoaligner` struct + `process_reads`
driver (reference: src/pseudoaligner.rs:26-33, 420-514).  The reference's
N worker threads pulling one read at a time from a mutexed iterator become
a host batching pipeline feeding a jitted device step; results stream back
per batch.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial

import jax
import numpy as np

from ..config import AlignerConfig
from ..index.image import IndexImage
from ..io.fastq import FastqReader, ReadBatch
from ..ops.map_kernel import (
    MapResult,
    device_index_from_image,
    map_batch_packed,
    pack_reads_host,
)

log = logging.getLogger(__name__)


@dataclass
class ReadRecord:
    """Per-read mapping record — mirrors the reference's output tuple
    `(flag, read_id, eq_class, coverage)` (src/pseudoaligner.rs:453-462),
    including the reference's flag predicate
    `coverage >= READ_COVERAGE_THRESHOLD && eq_class.is_empty()`
    (src/pseudoaligner.rs:455 — preserved as-is for behavior parity)."""

    flag: bool
    read_id: str
    eq_class: list[int]
    coverage: int

    def format_reference_style(self) -> str:
        """Render exactly like Rust's `println!("{:?}", read_data)`."""
        flag = "true" if self.flag else "false"
        eq = "[" + ", ".join(str(x) for x in self.eq_class) + "]"
        return f'({flag}, "{self.read_id}", {eq}, {self.coverage})'


class Pseudoaligner:
    """Index container + mapping engine (the framework's flagship model)."""

    def __init__(
        self,
        image: IndexImage,
        config: AlignerConfig | None = None,
        device=None,
    ):
        if config is None:
            config = AlignerConfig(k=image.k)
        if config.k != image.k:
            raise ValueError(f"config k={config.k} != index k={image.k}")
        self.image = image
        self.config = config
        dev, meta = device_index_from_image(image, config)
        self.meta = meta
        self.dev = jax.device_put(dev, device)
        self._step = jax.jit(partial(map_batch_packed, meta))
        # host-side EC intersection memo for the CSR fallback path
        self._ec_memo: dict[tuple[int, ...], list[int]] = {}
        # raw-signature-row -> materialized EC array (emit fast path):
        # steady-state batches repeat almost all signatures, so the per-row
        # python (dedup-sort + CSR intersect) runs only on first sight
        self._sig_cache: dict[bytes, np.ndarray] = {}
        self._single_cache: dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------
    # device step
    # ------------------------------------------------------------------

    def map_batch_device(self, codes: np.ndarray, lens: np.ndarray) -> MapResult:
        """Run the jitted mapping step on a [B, L] batch (codes are packed
        2-bit on the host so the host->device transfer is 16x smaller)."""
        packed = pack_reads_host(np.asarray(codes, dtype=np.uint8))
        result = self._step(self.dev, packed, lens.astype(np.int32))
        if self.meta.distinct_cap > 0:
            # enqueue the D2H copy of the compact outputs NOW: by the time
            # emit_prepare fetches them (a pipeline step later) the
            # transfer has ridden the link behind the next dispatch and
            # np.asarray returns instantly (measured ~80ms -> ~0.2ms of
            # blocked host time per batch on the tunneled link; each
            # synchronous fetch costs a ~28ms roundtrip — PERF.md)
            try:
                result.ec_distinct.copy_to_host_async()
                result.coverage.copy_to_host_async()
            except Exception:
                pass
        return result

    # ------------------------------------------------------------------
    # host post-processing
    # ------------------------------------------------------------------

    def _ec_from_bits(self, bits_row: np.ndarray) -> list[int]:
        by = np.ascontiguousarray(bits_row).view(np.uint8)
        unpacked = np.unpackbits(by, bitorder="little")[: self.image.n_tx]
        return np.nonzero(unpacked)[0].tolist()

    def _ec_from_nodes(self, nodes: np.ndarray) -> list[int]:
        """Host CSR intersection fallback (large transcriptomes) —
        set-equivalent to src/pseudoaligner.rs:323-356."""
        img = self.image
        ec_ids = tuple(sorted(set(int(img.node_ec[n]) for n in nodes if n >= 0)))
        hit = self._ec_memo.get(ec_ids)
        if hit is not None:
            return hit
        lists = sorted(
            (img.ec_list(e) for e in ec_ids), key=len
        )
        acc = lists[0]
        for other in lists[1:]:
            acc = np.intersect1d(acc, other, assume_unique=True)
            if len(acc) == 0:
                break
        out = [int(x) for x in acc]
        self._ec_memo[ec_ids] = out
        return out

    def _ec_from_distinct(self, ids: tuple[int, ...]) -> list[int]:
        """Materialize the EC list from distinct interned class ids
        (memoized host CSR intersection)."""
        hit = self._ec_memo.get(ids)
        if hit is not None:
            return hit
        img = self.image
        lists = sorted((img.ec_list(e) for e in ids), key=len)
        acc = lists[0]
        for other in lists[1:]:
            acc = np.intersect1d(acc, other, assume_unique=True)
            if len(acc) == 0:
                break
        out = [int(x) for x in acc]
        self._ec_memo[ids] = out
        return out

    def records_from_result(
        self, result: MapResult, batch: ReadBatch
    ) -> list[ReadRecord]:
        mapped, cov = jax.device_get((result.mapped, result.coverage))
        mapped = np.asarray(mapped)
        cov = np.asarray(cov)
        compact = self.meta.distinct_cap > 0
        n = len(batch.ids)
        thresh = self.config.read_coverage_threshold

        if compact:
            # vectorized: materialize each distinct EC signature once (the
            # signature cardinality per batch is tiny vs the batch size)
            dist = np.asarray(result.ec_distinct)[:n]
            uniq, inv = np.unique(dist, axis=0, return_inverse=True)
            eq_of_sig: list = []
            for row in uniq:
                if row[-1] in (-2, -3):
                    eq_of_sig.append(None)  # overflow/capped -> exact re-map
                elif row[0] < 0:
                    eq_of_sig.append([])
                else:
                    # device emits raw push-order ids; dedup here
                    ids = tuple(sorted({int(x) for x in row if x >= 0}))
                    eq_of_sig.append(
                        self.image.ec_list(ids[0]).tolist()
                        if len(ids) == 1
                        else self._ec_from_distinct(ids)
                    )
            covl = cov.tolist()
            mappedl = mapped.tolist()
            overflow_rows = [
                i for i in range(n) if mappedl[i] and eq_of_sig[inv[i]] is None
            ]
            overflow_res = self._remap_rows(batch, overflow_rows)
            out = []
            for i, rid in enumerate(batch.ids):
                if not mappedl[i]:
                    out.append(ReadRecord(False, rid, [], 0))
                    continue
                eq = eq_of_sig[inv[i]]
                c = covl[i]
                if eq is None:
                    req, rcov = overflow_res[i]
                    eq = [int(x) for x in req]
                    c = rcov  # iteration-capped lanes have partial coverage
                out.append(ReadRecord(c >= thresh and not eq, rid, eq, c))
            return out

        if self.meta.tx_words > 0:
            bits = np.asarray(result.ec_bits)
        else:
            nodes = np.asarray(result.nodes)
            n_nodes = np.asarray(result.n_nodes)
        out = []
        for i, rid in enumerate(batch.ids):
            if not mapped[i]:
                out.append(ReadRecord(False, rid, [], 0))
                continue
            if self.meta.tx_words > 0:
                eq = self._ec_from_bits(bits[i])
            else:
                eq = self._ec_from_nodes(nodes[i, : n_nodes[i]])
            c = int(cov[i])
            flag = c >= thresh and len(eq) == 0
            out.append(ReadRecord(flag, rid, eq, c))
        return out

    # ------------------------------------------------------------------
    # native batch emit (the serving fast path)
    # ------------------------------------------------------------------

    def emit_batch(self, result: MapResult, batch: ReadBatch, tcc=None) -> bytes:
        """Format a whole batch's records reference-style via the native
        emitter — no per-read python objects.  Compact mode, no window
        groups (caller routes long-read batches through the record path).
        Returns the formatted bytes; updates `tcc` counts if given.

        Synchronous convenience wrapper over emit_prepare + emit_finish.
        Pipelined callers (emit_fastq, bench) should call the two phases a
        batch apart: emit_prepare dispatches the overflow re-map, which
        lands in the device queue AFTER the next batch's map step — so
        finishing immediately stalls for that whole step, while finishing
        one batch later finds the re-map already complete (measured: the
        stall was ~60% of the serving period)."""
        return self.emit_finish(self.emit_prepare(result, batch, tcc))

    def emit_prepare(self, result: MapResult, batch: ReadBatch, tcc=None):
        """Phase 1: fetch compact outputs, dispatch the overflow re-map,
        group signatures and materialize their EC lists (cached).  Returns
        an opaque state for emit_finish."""
        n = len(batch.ids)
        # one batched fetch = one tunnel roundtrip for both arrays (two
        # np.asarray calls pay two ~28ms roundtrips — PERF.md)
        dist, cov = jax.device_get((result.ec_distinct, result.coverage))
        cov = cov[:n].astype(np.int32)
        dist = dist[:n]
        # dispatch the overflow re-map first so it overlaps the host work
        flagged = (dist[:, -1] == -2) | (dist[:, -1] == -3)
        overflow_rows = np.nonzero(flagged)[0].tolist()
        remap_fut = self._remap_dispatch(batch, overflow_rows)
        # signature grouping: most rows are single-class ([e, -1, ...]) —
        # group those on one int column (fast) and only the multi-class
        # minority by full rows (flagged rows must stay in the full-row
        # group so their markers survive)
        single = (
            (dist[:, 1] == -1) & ~flagged
            if dist.shape[1] >= 2
            else np.zeros(n, bool)
        )
        u1, inv1 = np.unique(dist[single, 0], return_inverse=True)
        multi = dist[~single]
        if len(multi):
            # exact lexicographic row grouping: lexsort + adjacent compare
            # (np.unique(axis=0)'s void-view sort measured ~9x slower on
            # the same rows)
            order = np.lexsort(multi.T[::-1])
            sm = multi[order]
            head = np.ones(len(sm), dtype=bool)
            if len(sm) > 1:
                head[1:] = np.any(sm[1:] != sm[:-1], axis=1)
            gid_sorted = np.cumsum(head) - 1
            u2 = sm[head]
            inv2 = np.empty(len(multi), dtype=np.int64)
            inv2[order] = gid_sorted
        else:
            u2 = np.zeros((0, dist.shape[1]), dist.dtype)
            inv2 = np.zeros(0, np.int64)
        inv = np.empty(n, dtype=np.int64)
        inv[single] = inv1
        inv[~single] = inv2 + len(u1)

        empty_u32 = np.zeros(0, np.uint32)
        sig_lists: list[np.ndarray] = []
        for e in u1.tolist():
            if e < 0:
                sig_lists.append(empty_u32)
                continue
            hit = self._single_cache.get(e)
            if hit is None:
                hit = np.asarray(self.image.ec_list(e), dtype=np.uint32)
                self._single_cache[e] = hit
            sig_lists.append(hit)
        for row in u2:
            if row[-1] == -2 or row[-1] == -3:
                sig_lists.append(None)  # per-read overflow, patched below
                continue
            if row[0] < 0:
                sig_lists.append(empty_u32)
                continue
            key = row.tobytes()
            hit = self._sig_cache.get(key)
            if hit is None:
                ids = tuple(sorted({int(x) for x in row if x >= 0}))
                eq = (
                    self.image.ec_list(ids[0])
                    if len(ids) == 1
                    else self._ec_from_distinct(ids)
                )
                hit = np.asarray(eq, dtype=np.uint32)
                self._sig_cache[key] = hit
            sig_lists.append(hit)

        sig_lens = np.array(
            [len(x) if x is not None else 0 for x in sig_lists], dtype=np.int64
        )
        sig_start = np.zeros(len(sig_lists) + 1, dtype=np.int64)
        np.cumsum(sig_lens, out=sig_start[1:])
        sig_flat = (
            np.concatenate([x if x is not None else np.zeros(0, np.uint32)
                            for x in sig_lists])
            if sig_lists else np.zeros(0, np.uint32)
        )

        return {
            "batch": batch,
            "tcc": tcc,
            "n": n,
            "cov": cov,
            "inv": inv,
            "sig_lists": sig_lists,
            "sig_start": sig_start,
            "sig_flat": sig_flat,
            "overflow_rows": overflow_rows,
            "remap_fut": remap_fut,
        }

    def emit_finish(self, state) -> bytes:
        """Phase 2: collect the overflow re-map, patch coverage and format
        via the signature-indirect native emitter (each distinct EC
        signature is rendered once in C++; no per-read expansion)."""
        from ..io import native as _native

        batch = state["batch"]
        tcc = state["tcc"]
        n = state["n"]
        cov = state["cov"]
        inv = state["inv"]
        sig_lists = state["sig_lists"]
        sig_start = state["sig_start"]
        sig_flat = state["sig_flat"]
        overflow_rows = state["overflow_rows"]

        overflow_res = self._remap_collect(state["remap_fut"])
        overflow_eq = {i: r[0] for i, r in overflow_res.items()}
        for i in overflow_rows:
            cov[i] = overflow_res[i][1]  # capped lanes: exact coverage

        # overflow rows (exactly the None-signature rows) take their EC
        # lists from the override arrays; everything else is sig-indirect
        none_mask = np.array([x is None for x in sig_lists], dtype=bool)
        sig_of_read = np.where(none_mask[inv], np.int64(-1), inv)
        ovr_rows = np.asarray(overflow_rows, dtype=np.int64)
        ovr_start = np.zeros(len(ovr_rows) + 1, dtype=np.int64)
        if len(ovr_rows):
            np.cumsum(
                np.array([len(overflow_eq[i]) for i in overflow_rows],
                         dtype=np.int64),
                out=ovr_start[1:],
            )
        ovr_ids = (
            np.concatenate([overflow_eq[i] for i in overflow_rows])
            if len(ovr_rows)
            else np.zeros(0, np.uint32)
        )

        id_lens = np.array([len(s) for s in batch.ids], dtype=np.int64)
        id_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(id_lens, out=id_offs[1:])
        ids_concat = "".join(batch.ids).encode()

        if tcc is not None:
            tcc.n_reads += n
            sig_counts = np.bincount(inv, minlength=len(sig_lists))
            for si in sig_counts.nonzero()[0]:
                cnt = int(sig_counts[si])
                lst = sig_lists[si]
                if lst is None or len(lst) == 0:
                    continue
                key = tuple(int(x) for x in lst)
                j = tcc.classes.get(key)
                if j is None:
                    j = len(tcc.counts)
                    tcc.classes[key] = j
                    tcc.counts.append(0)
                tcc.counts[j] += cnt
                tcc.n_mapped += cnt
            for i in overflow_rows:
                if len(overflow_eq[i]):
                    tcc.add(overflow_eq[i].tolist())
                    tcc.n_reads -= 1  # add() already counted the read

        return _native.emit_records_sig(
            cov, self.config.read_coverage_threshold, ids_concat, id_offs,
            sig_of_read, sig_start, sig_flat, ovr_rows, ovr_start, ovr_ids,
        )

    def emit_fastq(self, path: str, out, skip_reads: int = 0, tcc=None,
                   progress_cb=None):
        """Stream a FASTQ and write reference-style records to `out` (a
        binary stream) via the native emitter.  Falls back to the record
        path for batches containing segmented long reads.  Returns
        (n_reads, n_flagged)."""
        reader = FastqReader(
            path,
            batch_size=self.config.batch_size,
            max_len=self.config.max_read_len,
            segment_long=True,
            window_overlap=self.config.k - 1,
            skip_reads=skip_reads,
        )
        n_reads = 0
        n_flagged = 0
        pending = None
        merge_state = None  # incremental window-merge carry across batches

        def put_record(rec):
            nonlocal n_reads, n_flagged
            out.write(rec.format_reference_style().encode() + b"\n")
            if tcc is not None:
                tcc.add(rec.eq_class, mapped=rec.coverage > 0)
            n_reads += 1
            n_flagged += rec.flag

        # deferred emit_finish state: batch k's formatted output is written
        # at batch k+1's flush, after the NEXT map step has been dispatched
        # — by then the overflow re-map (queued behind that map step) has
        # run, so emit_finish never stalls on the device (see emit_batch)
        prepared = None

        def flush_prepared():
            nonlocal n_reads, n_flagged, prepared
            if prepared is None:
                return
            st, n = prepared
            prepared = None
            data = self.emit_finish(st)
            out.write(data)
            n_reads += n
            n_flagged += int(data.count(b"(true"))

        def flush(res, batch, next_first_group):
            nonlocal n_reads, n_flagged, merge_state, prepared
            grp = batch.group
            n = len(batch.ids)
            simple = (
                self.meta.distinct_cap > 0
                and merge_state is None
                and grp is not None
                and len(np.unique(grp)) == n
                and (next_first_group is None or int(grp[n - 1]) != next_first_group)
            )
            if simple:
                st = self.emit_prepare(res, batch, tcc=tcc)
                flush_prepared()  # write the PREVIOUS batch (order-preserving)
                prepared = (st, n)
            else:
                flush_prepared()
                for rec, g, end in self._batch_rows(res, batch):
                    merge_state, done = self._merge_push(merge_state, rec, g, end)
                    if done is not None:
                        put_record(done)
                if next_first_group is None or (
                    merge_state is not None and merge_state[0] != next_first_group
                ):
                    if merge_state is not None:
                        put_record(
                            self._finalize_merged(merge_state[1], merge_state[2])
                        )
                        merge_state = None

        for batch in reader:
            res = self.map_batch_device(batch.codes, batch.lens)
            if pending is not None:
                flush(*pending, int(batch.group[0]) if batch.group is not None else None)
                if progress_cb is not None:
                    progress_cb(n_reads)
            pending = (res, batch)
        if pending is not None:
            flush(*pending, None)
        flush_prepared()
        if pending is not None and progress_cb is not None:
            progress_cb(n_reads)
        return n_reads, n_flagged

    def _host_mapper(self):
        """Native scalar mapper (bit-exact with the golden oracle), lazily
        constructed; None when the toolchain is unavailable."""
        if not hasattr(self, "_host_mapper_inst"):
            try:
                from ..ops.native import HostMapper

                self._host_mapper_inst = HostMapper(self.image)
            except Exception:
                self._host_mapper_inst = None
        return self._host_mapper_inst

    def _remap_dispatch(self, batch: ReadBatch, rows: list[int]):
        """Start the exact re-map of the flagged overflow reads.

        Preferred path: the native HOST mapper (ops/native/mapper.cpp) —
        scalar walks on host threads, fully overlapped with the device, so
        the re-map costs ZERO device time (a second device dispatch sits
        in the queue behind the next batch's map step; see PERF.md).  The
        device full-output pass remains as the no-toolchain fallback.
        Returns an opaque handle for _remap_collect."""
        if not rows:
            return None
        if self._host_mapper() is not None:
            codes = np.ascontiguousarray(
                np.asarray(batch.codes, dtype=np.uint8)[rows]
            )
            lens = np.asarray(batch.lens, dtype=np.int32)[rows]
            # run the native walk on a background thread NOW (ctypes
            # releases the GIL): collect one pipeline step later finds it
            # done instead of spending ~20ms of serial host time there
            if not hasattr(self, "_remap_pool"):
                from concurrent.futures import ThreadPoolExecutor

                self._remap_pool = ThreadPoolExecutor(max_workers=1)
            fut = self._remap_pool.submit(
                self._host_mapper().map_reads,
                codes,
                lens,
                self.config.allowed_mismatches,
                self.config.left_extend_fraction,
            )
            return ("host", rows, fut)
        B2 = 2048
        if not hasattr(self, "_remap_step"):
            import dataclasses
            from functools import partial

            from ..ops.map_kernel import map_batch_packed

            meta_full = dataclasses.replace(
                self.meta, distinct_cap=0, tx_words=0, max_walk_iters=0, max_left_iters=0
            )
            self._remap_step = jax.jit(partial(map_batch_packed, meta_full))
        L = self.meta.read_len
        futures = []
        for c0 in range(0, len(rows), B2):
            chunk = rows[c0 : c0 + B2]
            codes = np.zeros((B2, L), dtype=np.uint8)
            lens = np.zeros(B2, dtype=np.int32)
            for j, i in enumerate(chunk):
                codes[j] = batch.codes[i]
                lens[j] = batch.lens[i]
            packed = pack_reads_host(codes)
            futures.append((chunk, self._remap_step(self.dev, packed, lens)))
        return futures

    def _remap_collect(self, futures) -> dict:
        """Harvest _remap_dispatch results -> {row: (eq array, coverage)}."""
        out: dict[int, tuple] = {}
        if not futures:
            return out
        if isinstance(futures, tuple) and futures[0] == "host":
            _, rows, fut = futures
            cov, _mm, nodes, nn = fut.result()
            for j, i in enumerate(rows):
                eq = self._ec_from_nodes(nodes[j, : nn[j]]) if nn[j] else []
                out[i] = (np.asarray(eq, dtype=np.uint32), int(cov[j]))
            return out
        for chunk, fut in futures:
            res = jax.device_get(fut)
            nodes = np.asarray(res.nodes)
            nn = np.asarray(res.n_nodes)
            cov = np.asarray(res.coverage)
            for j, i in enumerate(chunk):
                eq = self._ec_from_nodes(nodes[j, : nn[j]]) if nn[j] else []
                out[i] = (np.asarray(eq, dtype=np.uint32), int(cov[j]))
        return out

    def _remap_rows(self, batch: ReadBatch, rows: list[int]) -> dict:
        """Synchronous exact re-map (dispatch + collect)."""
        return self._remap_collect(self._remap_dispatch(batch, rows))

    # ------------------------------------------------------------------
    # end-to-end streaming
    # ------------------------------------------------------------------

    def map_fastq(self, path: str, skip_reads: int = 0):
        """Stream a FASTQ file; yields ReadRecord per read, in file order.

        Reads longer than the compiled batch width are segmented into
        overlapping windows on the host and their window results merged
        (EC = intersection of mapped windows' classes; coverage = summed,
        capped at read length — an approximation of the reference's
        single-pass coverage for reads beyond the kernel width).

        skip_reads: resume support — skip the first N reads (restartable
        streaming; the reference has no mid-stream resume, SURVEY.md §5.4).
        """
        reader = FastqReader(
            path,
            batch_size=self.config.batch_size,
            max_len=self.config.max_read_len,
            segment_long=True,
            window_overlap=self.config.k - 1,
            skip_reads=skip_reads,
        )
        yield from self._merge_windows(self._stream_batches(reader))

    def _stream_batches(self, reader):
        """Double-buffered device execution; yields (record, group, read_len)."""
        pending = None
        for batch in reader:
            res = self.map_batch_device(batch.codes, batch.lens)
            if pending is not None:
                yield from self._batch_rows(*pending)
            pending = (res, batch)
        if pending is not None:
            yield from self._batch_rows(*pending)

    def _batch_rows(self, res, batch):
        recs = self.records_from_result(jax.device_get(res), batch)
        group = batch.group
        offset = batch.offset
        for i, rec in enumerate(recs):
            g = int(group[i]) if group is not None else i
            off = int(offset[i]) if offset is not None else 0
            yield rec, g, off + int(batch.lens[i])

    def _merge_push(self, state, rec, g, end):
        """Incremental window merger: push one row, return (state, done)
        where done is a finalized ReadRecord or None."""
        from ..golden import intersect

        if state is None:
            return (g, rec, end), None
        cg, crec, cend = state
        if g != cg:
            return (g, rec, end), self._finalize_merged(crec, cend)
        if rec.coverage and crec.coverage:
            eq = intersect(list(crec.eq_class), rec.eq_class)
        elif rec.coverage:
            eq = rec.eq_class
        else:
            eq = crec.eq_class
        merged = ReadRecord(False, crec.read_id, eq, crec.coverage + rec.coverage)
        return (cg, merged, max(cend, end)), None

    def _merge_windows(self, rows):
        """Merge per-window records of segmented long reads."""
        state = None
        for rec, g, end in rows:
            state, done = self._merge_push(state, rec, g, end)
            if done is not None:
                yield done
        if state is not None:
            yield self._finalize_merged(state[1], state[2])

    def _finalize_merged(self, rec: ReadRecord, total_len: int) -> ReadRecord:
        cov = min(rec.coverage, total_len)
        flag = cov >= self.config.read_coverage_threshold and len(rec.eq_class) == 0
        return ReadRecord(flag, rec.read_id, rec.eq_class, cov)

    def map_fastq_paired(self, path1: str, path2: str):
        """Paired-end mapping (BASELINE config 3): both mates are mapped
        and their equivalence classes intersected — the compatible set for
        the fragment.  If only one mate maps, its class is used; if
        neither maps, the pair is unmapped.  Coverage is summed.

        The reference has no paired mode (single FASTQ only,
        src/bin/pseudoaligner.rs:28); semantics follow kallisto's
        paired-end EC intersection.

        Batched fast path: both mates' device steps for the NEXT batch pair
        are dispatched before the current pair's host post-processing (the
        same double-buffer pattern as map_fastq), and pair intersections
        are memoized by (eq_a, eq_b) signature — mate signatures repeat
        heavily, so almost every pair is a dict hit.
        """
        r1 = FastqReader(path1, self.config.batch_size, self.config.max_read_len)
        r2 = FastqReader(path2, self.config.batch_size, self.config.max_read_len)
        pending = None
        pair_memo: dict = {}
        for b1, b2 in zip(r1, r2):
            if b1.n_reads != b2.n_reads:
                raise ValueError("paired FASTQs have different read counts")
            res1 = self.map_batch_device(b1.codes, b1.lens)
            res2 = self.map_batch_device(b2.codes, b2.lens)
            if pending is not None:
                yield from self._paired_rows(*pending, pair_memo)
            pending = (res1, res2, b1, b2)
        if pending is not None:
            yield from self._paired_rows(*pending, pair_memo)

    def _paired_rows(self, res1, res2, b1, b2, pair_memo: dict):
        from ..golden import intersect

        recs1 = self.records_from_result(jax.device_get(res1), b1)
        recs2 = self.records_from_result(jax.device_get(res2), b2)
        thresh = self.config.read_coverage_threshold
        for a, b in zip(recs1, recs2):
            cov = a.coverage + b.coverage
            if a.coverage and b.coverage:
                key = (tuple(a.eq_class), tuple(b.eq_class))
                eq = pair_memo.get(key)
                if eq is None:
                    eq = intersect(list(a.eq_class), b.eq_class)
                    pair_memo[key] = eq
                eq = list(eq)  # records must not share the memo's list
            elif a.coverage:
                eq = a.eq_class
            elif b.coverage:
                eq = b.eq_class
            else:
                eq = []
            flag = cov >= thresh and len(eq) == 0
            yield ReadRecord(flag, a.read_id, eq, cov)
