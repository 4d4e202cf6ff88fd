"""QueryEngine: device-resident index + chunked query execution.

Hosts the bit-slice matrix in device HBM once and streams fixed-shape
(jit-cache-friendly) k-mer batches through the fused gather/AND/count
kernels. All string work and XXH3 hashing happen host-side; only dense
integer tensors cross the host→device boundary.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import native
from .hashing.xxh3 import bloom_rows_batch
from .index.bigsi import BigsiIndex
from .ops.hash_jax import pack_keys_host
from .ops.query import (
    FREQ_CAP,
    PAD_POS,
    pack_matrix_blocks,
    query_accumulate_hash_scan,
    query_accumulate_hash_scan_exact,
    query_accumulate_scan,
    query_readid_batch,
    query_readid_firsthit,
    query_readid_hash_batch,
)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclass
class SearchResult:
    counts: np.ndarray  # int64 [C] per-color hit counts
    all_valid: bool  # every query k-mer had all rows present
    and_all: np.ndarray  # uint32 [W] global AND over k-mers
    freq_hist: np.ndarray  # int64 [C, FREQ_CAP] uniq-hit freq histogram
    over_colors: np.ndarray  # int32 [n_over] overflow colors
    over_freqs: np.ndarray  # int32 [n_over] overflow freqs (>= FREQ_CAP)

    def freq_stats(self) -> dict[int, tuple[float, int, int]]:
        """Exact per-color (mean, mode, n) of the uniq-hit k-mer frequency
        multiset (the reference's uniq_freqs, batch_search_pe.rs:75-83;
        mean/mode per reports.rs:8-77, ties -> smallest value)."""
        out: dict[int, tuple[float, int, int]] = {}
        C = self.freq_hist.shape[0]
        vals = np.arange(self.freq_hist.shape[1], dtype=np.int64)
        for c in range(C):
            h = self.freq_hist[c]
            n = int(h.sum())
            total = int((h * vals).sum())
            occ: dict[int, int] = {}
            nz = np.nonzero(h)[0]
            for v in nz:
                occ[int(v)] = int(h[v])
            sel = self.over_colors == c
            if sel.any():
                for f in self.over_freqs[sel]:
                    occ[int(f)] = occ.get(int(f), 0) + 1
                    total += int(f)
                    n += 1
            if n == 0:
                continue
            best = max(occ.values())
            modus = min(v for v, k in occ.items() if k == best)
            out[c] = (total / n, modus, n)
        return out


class QueryEngine:
    """Executes the BIGSI hot loop on one device."""

    def __init__(self, index: BigsiIndex, chunk: int = 1 << 20):
        self.index = index
        self.chunk = chunk
        blocks, self.wpad = pack_matrix_blocks(np.asarray(index.matrix))
        self.blocks2 = jnp.asarray(blocks)
        # blocked (turbo) layout: one 512B block per k-mer (ops/blocked.py);
        # bv: 0 = classic rows, 1 = blocked, 2 = blocked split-lane (the
        # sorted-stream kernel's layout, ops/stream_query.py)
        self.bv = int(index.blocked)
        if self.bv and self.wpad > 128:
            raise ValueError(
                "blocked (turbo) layout holds a k-mer's rows in one 512B "
                "block and supports <= 4096 colors per device; use a classic "
                "index or shard colors across devices"
            )
        self.rpb = (128 // self.wpad) if self.bv else 0
        # shard-placed blocked indexes (build --color-shards): the
        # placement row group follows a color SHARD's packed width, not
        # this engine's full-width packing, so the single-device engine
        # hashes with the recorded placement but gathers generically (the
        # fast paths live on the ("data", "color") mesh,
        # parallel/sharded.py::stream_batch_colorshard)
        self.rpb_place = getattr(index, "place_rpb", 0) or self.rpb
        self._custom_place = self.rpb_place != self.rpb
        if self._custom_place:
            self.rpb = 0
        q = max(self.wpad // 128, 1)
        # device addressing is per-block (int32): rows <= one block need only
        # the row index to fit; wide rows address bloom_size * q blocks.
        # Beyond int32 row addressing the engine switches to the wide path:
        # the host pre-splits every row index into (block, lane) int32 pairs
        # (ops/query.py::split_rows_wide), keeping the reference's open-ended
        # usize bloom_size domain (src/main.rs:475-477) up to 2^38 bits.
        addr = index.bloom_size * (q if self.wpad > 128 else 1)
        self._wide = False
        if addr >= 2**31:
            if self.bv or self.wpad > 128:
                raise ValueError(
                    "bloom_size exceeds int32 device block addressing for "
                    "this layout; use a classic index (<= 4096 colors) or "
                    "shard colors/rows across devices"
                )
            if index.bloom_size * self.wpad >= 2**38:
                raise ValueError(
                    "bloom_size exceeds wide block addressing (2^38 bits); "
                    "shard rows across devices"
                )
            self._wide = True
        # wide rows multiply the epilogue's [chunk, colors] footprint; cap
        # the scan chunk (and batch pad floors) so it stays HBM-friendly
        if self.wpad > 128:
            self.chunk = min(self.chunk, max((1 << 29) // (self.wpad * 128), 2048))
            self._minpad = 2048
            self._rid_reads = 1024
            self._rid_floor = 4096
        else:
            self._minpad = 16384
            self._rid_reads = 8192
            self._rid_floor = 65536
        self._stream = False
        self._stream_classic = False
        if (
            self.bv in (2, 3, 4)  # split-lane placements
            and index.num_hash in (1, 2, 4)  # the kernel's gather trees
            and self.wpad <= 32  # kernel color capacity: 32*wpad <= 1024
            and os.environ.get("COLORID_STREAM", "1") != "0"
        ):
            from .ops.stream_query import byte_plane_blocks

            # int8 byte-plane copy of the matrix (1x its HBM footprint;
            # only materialized when streaming is enabled)
            self._blocks_bp = byte_plane_blocks(self.blocks2)
            self._stream = True
        elif (
            self.bv == 0  # reference-placement (classic) rows
            and self.wpad == 1  # <= 32 colors (wider rows: generic gather)
            and index.bloom_size < 2**31
            and os.environ.get("COLORID_STREAM", "1") != "0"
        ):
            from .ops.stream_query import byte_plane_blocks

            self._blocks_bp = byte_plane_blocks(self.blocks2)
            self._stream_classic = True

    def _use_stream(self, seg_kmers: int) -> bool:
        """Sorted-stream kernel (default on for eligible blocked-v2
        indexes): it pays off when probes are dense relative to the matrix
        (each 128-block tile touched by many probes); sparse segments keep
        the generic block gather. COLORID_STREAM=force streams every
        segment (testing); =0 disables."""
        if not self._stream:
            return False
        if os.environ.get("COLORID_STREAM") == "force":
            return True
        n_blocks = self.index.bloom_size // self.rpb
        return seg_kmers >= 4 * n_blocks

    def _use_stream_classic(self, n_kmers: int, k: int | None) -> bool:
        """Classic sorted-row stream (ops/stream_query.py::
        stream_accumulate_classic_exact): pays off when the H*N row probes
        are dense relative to the matrix blocks (a PC_CL-probe chunk must
        span <= the kernel's 2-tile window, so >= ~32 probes/block);
        sparse queries keep the generic gather."""
        if not self._stream_classic or not (k and 4 <= k <= 32):
            return False
        if os.environ.get("COLORID_STREAM") == "force":
            return True
        from .ops.stream_query import PC_CL, T

        n_blocks = self.blocks2.shape[0]
        span = 2 * T  # the kernel's window, in blocks
        return n_kmers * self.index.num_hash >= (PC_CL // span) * n_blocks

    # -- hashing ------------------------------------------------------------

    def rows_for_keys(self, keys: np.ndarray) -> np.ndarray:
        """XXH3 row indices [N, H] for canonical k-mer byte rows [N, k]."""
        if self.bv:
            from .ops.blocked import blocked_rows_host

            return blocked_rows_host(
                keys, self.index.num_hash, self.index.bloom_size,
                self.rpb_place, version=self.bv,
            ).astype(np.int32)
        dt = np.int64 if self._wide else np.int32
        # the native row hasher emits uint32 rows: valid through 2^32;
        # larger blooms take the numpy uint64 path
        if (
            keys.shape[0]
            and native.available()
            and self.index.bloom_size <= 2**32
        ):
            return native.xxh3_rows(
                keys, self.index.num_hash, self.index.bloom_size
            ).astype(dt)
        return bloom_rows_batch(
            keys, self.index.num_hash, self.index.bloom_size
        ).astype(dt)

    # -- search (batch_search_pe / perfect_search hot loop) ------------------

    def search_keys(
        self,
        keys: np.ndarray | None,
        qcounts: np.ndarray | None = None,
        rows_all: np.ndarray | None = None,
        packed_all: np.ndarray | None = None,
        k: int | None = None,
    ) -> SearchResult:
        """Per-color counts + uniq-hit coverage stats for a set of k-mers.

        Inputs, most to least preferred: ``packed_all`` [N, 2] uint32 2-bit
        packed k-mers (+ static k) hash on device; ``keys`` ASCII rows pack
        host-side when eligible; ``rows_all`` precomputed row indices skip
        hashing entirely. The whole query accumulates on device (donated
        stats + per-color frequency histogram + compacted overflow list);
        the host fetches once at the end, a few hundred KB regardless of
        query size."""
        if packed_all is not None:
            n = packed_all.shape[0]
        elif rows_all is not None:
            n = rows_all.shape[0]
        else:
            n = keys.shape[0]
        C = self.index.n_colors
        W = self.index.words_per_row
        counts = np.zeros(C, dtype=np.int64)
        and_all = np.full(W, 0xFFFFFFFF, dtype=np.uint32)
        empty_hist = np.zeros((C, FREQ_CAP), dtype=np.int64)
        none = np.zeros(0, dtype=np.int32)
        if n == 0:
            return SearchResult(counts, True, and_all, empty_hist, none, none)
        if packed_all is not None and not (
            k and 4 <= k <= 32 and self.index.bloom_size < 2**31
            and not self._custom_place
        ):
            # device hash envelope exceeded: fall back to host hashing
            packed_all = None
            if keys is None and rows_all is None:
                raise ValueError(
                    "packed_all is outside the device-hash envelope "
                    f"(k={k}, bloom_size={self.index.bloom_size}; need "
                    "4 <= k <= 32 and bloom_size < 2^31) and no keys/rows "
                    "were given to hash host-side"
                )
        if packed_all is None and rows_all is None:
            k = keys.shape[1]
            if (
                4 <= k <= 32 and self.index.bloom_size < 2**31
                and not self._custom_place
            ):
                packed_all = pack_keys_host(keys)
            if packed_all is None:
                rows_all = self.rows_for_keys(keys)
        if qcounts is None:
            qcounts = np.ones(n, dtype=np.int32)
        qcounts = np.asarray(qcounts, dtype=np.int32)
        if packed_all is not None and self._use_stream_classic(n, k):
            res = self._search_keys_classic_stream(packed_all, qcounts, k)
            if res is not None:
                return res
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),  # and-words
                jnp.array([1, 0], dtype=jnp.int32),  # ok, n_over
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = _round_up(n, 1024)
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        # one device call per segment; a segment scans fixed-size chunks
        chunk = min(self.chunk, 1 << 20)
        seg = chunk * 8
        drops: list = []
        for start in range(0, n, seg):
            stop = min(start + seg, n)
            m = stop - start
            size = _round_up(m, chunk) if m > chunk else _round_up(m, min(self._minpad, chunk))
            csize = chunk if m > chunk else size
            if m == size:
                qc = np.minimum(np.maximum(qcounts[start:stop], 1), 65535).astype(np.uint16)
            else:
                qc = np.zeros(size, dtype=np.uint16)
                qc[:m] = np.minimum(np.maximum(qcounts[start:stop], 1), 65535)
            if packed_all is not None:
                if m == size:  # full segment: zero-copy contiguous view
                    pk = packed_all[start:stop]
                else:
                    pk = np.zeros((size, 2), dtype=np.uint32)
                    pk[:m] = packed_all[start:stop]
                    qc[m:] = 0  # padding marker
                if self._use_stream(m):
                    from .ops.stream_query import stream_accumulate_hash

                    stats, hist, oc_buf, of_buf, nd = stream_accumulate_hash(
                        stats,
                        hist,
                        oc_buf,
                        of_buf,
                        self.blocks2,
                        self._blocks_bp,
                        jnp.asarray(pk),
                        jnp.asarray(qc),
                        jnp.int32(start),
                        wpad=self.wpad,
                        k=k,
                        num_hash=self.index.num_hash,
                        bloom_size=self.index.bloom_size,
                        rpb=self.rpb,
                        n_colors=C,
                        bv=self.bv,
                    )
                    drops.append(nd)
                    continue
                stats, hist, oc_buf, of_buf = query_accumulate_hash_scan(
                    stats,
                    hist,
                    oc_buf,
                    of_buf,
                    self.blocks2,
                    jnp.asarray(pk),
                    jnp.asarray(qc),
                    jnp.int32(start),
                    wpad=self.wpad,
                    chunk=csize,
                    k=k,
                    num_hash=self.index.num_hash,
                    bloom_size=self.index.bloom_size,
                    rpb=self.rpb,
                    bv=self.bv or 1,
                )
                continue
            mask = np.zeros(size, dtype=bool)
            mask[:m] = True
            if self._wide:
                from .ops.query import (
                    query_accumulate_scan_wide,
                    split_rows_wide,
                )

                rows = np.zeros(
                    (size, self.index.num_hash), dtype=np.int64
                )
                rows[:m] = rows_all[start:stop]
                blk, lane0 = split_rows_wide(rows, self.wpad)
                stats, hist, oc_buf, of_buf = query_accumulate_scan_wide(
                    stats, hist, oc_buf, of_buf,
                    self.blocks2,
                    jnp.asarray(blk), jnp.asarray(lane0),
                    jnp.asarray(mask), jnp.asarray(qc),
                    jnp.int32(start),
                    wpad=self.wpad, chunk=csize,
                )
                continue
            rows = np.zeros((size, self.index.num_hash), dtype=np.int32)
            rows[:m] = rows_all[start:stop]
            stats, hist, oc_buf, of_buf = query_accumulate_scan(
                stats,
                hist,
                oc_buf,
                of_buf,
                self.blocks2,
                jnp.asarray(rows),
                jnp.asarray(mask),
                jnp.asarray(qc),
                jnp.int32(start),
                wpad=self.wpad,
                chunk=csize,
                rpb=self.rpb,
            )
        if drops and int(sum(int(np.asarray(d)) for d in drops)) > 0:
            # stream-kernel residual/overflow capacity exceeded (requires a
            # pathological probe distribution): rerun on the generic path
            self._stream = False
            try:
                return self.search_keys(
                    keys, qcounts, rows_all, packed_all, k
                )
            finally:
                self._stream = True
        return self._collect(stats, hist, oc_buf, of_buf, capO, qcounts)

    def search_keys_dev(
        self,
        pk_dev,  # uint32 [P, 2] device-resident packed k-mers
        qc_dev,  # int32 [P] device-resident full frequencies (0 = pad)
        k: int,
        max_freq: int | None = None,
    ) -> SearchResult | None:
        """search_keys over a device-resident, pre-padded query batch.

        The timed analogue of the reference's search span
        (batch_search_pe.rs:45-83): there the query k-mer count-map is
        already in host RAM when the span starts; here the packed k-mers
        are already in HBM. One exact-mode sorted-stream dispatch covers
        the whole batch and everything but the (rare) overflow list is
        fetched in a single D2H round trip. P must be a multiple of the
        stream chunk (ops/stream_query.PC) and the index must be
        stream-eligible. Returns None if the kernel's residual/overflow
        capacity was exceeded (caller reruns via the generic host path)."""
        vec, oc_buf, of_buf, capO = self.search_keys_dev_async(
            pk_dev, qc_dev, k=k, max_freq=max_freq
        )
        # ONE D2H round trip for stats + drop guard + histogram (the tunnel
        # RTT is 100-500ms; per-array fetches would dominate the span)
        return self.search_keys_dev_finish(
            np.asarray(vec), oc_buf, of_buf, capO
        )

    def search_keys_dev_async(self, pk_dev, qc_dev, k: int,
                              max_freq: int | None = None):
        """Dispatch half of search_keys_dev: returns (vec, oc_buf, of_buf,
        capO) with vec = concat([stats, n_drop, hist.ravel()]) still on
        device, so callers can pipeline several dispatches and fetch them
        in one stacked D2H (steady-state throughput measurement; a real
        streaming pipeline overlaps fetches with the next batch).

        max_freq: optional UPPER BOUND on the batch's k-mer frequencies
        (hosts that counted the k-mers know it for free). When it fits the
        sort key's low bits, the pre-kernel sort drops its frequency
        payload array (ops/stream_query.QKEY_BITS); a bound that is too
        low would silently clip overflow frequencies, so only pass a true
        bound."""
        from .ops.stream_query import (
            OVER_CAP,
            PC,
            QKEY_MASK,
            RES_CAP,
            stream_accumulate_hash_exact,
        )

        if not self._stream:
            raise ValueError("search_keys_dev requires a stream-eligible index")
        P = pk_dev.shape[0]
        if P % PC:
            raise ValueError(f"P must be a multiple of {PC}")
        if pk_dev.dtype != jnp.uint32 or qc_dev.dtype != jnp.int32:
            raise ValueError(
                "search_keys_dev expects uint32 packed k-mers and int32 "
                f"frequencies (0 = pad); got {pk_dev.dtype}/{qc_dev.dtype}"
            )
        C = self.index.n_colors
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),
                jnp.array([1, 0], dtype=jnp.int32),
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = OVER_CAP + RES_CAP  # both appenders are capped (stream_query)
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        stats, hist, oc_buf, of_buf, nd = stream_accumulate_hash_exact(
            stats, hist, oc_buf, of_buf,
            self.blocks2, self._blocks_bp,
            pk_dev, qc_dev,
            wpad=self.wpad, k=k, num_hash=self.index.num_hash,
            bloom_size=self.index.bloom_size, rpb=self.rpb,
            n_colors=C, bv=self.bv,
            qc_in_key=max_freq is not None and 0 < max_freq <= QKEY_MASK,
        )
        vec = jnp.concatenate([stats, nd[None], hist.reshape(-1)])
        return vec, oc_buf, of_buf, capO

    def search_keys_dev_generic_async(self, pk_dev, qc_dev, k: int):
        """Device-resident exact-mode query through the GENERIC block-gather
        path — works on every layout, including the reference-placement
        classic rows (simple_bloom.rs:19-26) that the sorted-stream kernel's
        split-lane layouts deliberately deviate from. Same async contract as
        search_keys_dev_async: returns (vec, oc_buf, of_buf, capO) with vec
        still on device so several dispatches can drain before ONE stacked
        D2H; decode with search_keys_dev_finish. P must be a multiple of the
        engine chunk; qcounts are full int32 frequencies with 0 = pad."""
        if not (4 <= k <= 32 and self.index.bloom_size < 2**31):
            raise ValueError("device hashing needs 4 <= k <= 32 and "
                             "bloom_size < 2^31")
        if pk_dev.dtype != jnp.uint32 or qc_dev.dtype != jnp.int32:
            raise ValueError(
                "search_keys_dev_generic expects uint32 packed k-mers and "
                f"int32 frequencies (0 = pad); got {pk_dev.dtype}/"
                f"{qc_dev.dtype}"
            )
        chunk = min(self.chunk, 1 << 20)
        P = pk_dev.shape[0]
        if P % chunk:
            raise ValueError(f"P must be a multiple of {chunk}")
        C = self.index.n_colors
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),
                jnp.array([1, 0], dtype=jnp.int32),
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = 1 << 18
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        stats, hist, oc_buf, of_buf = query_accumulate_hash_scan_exact(
            stats, hist, oc_buf, of_buf,
            self.blocks2, pk_dev, qc_dev,
            wpad=self.wpad, chunk=chunk, k=k,
            num_hash=self.index.num_hash,
            bloom_size=self.index.bloom_size,
            rpb=self.rpb, bv=self.bv or 1,
        )
        vec = jnp.concatenate(
            [stats, jnp.zeros(1, dtype=jnp.int32), hist.reshape(-1)]
        )
        return vec, oc_buf, of_buf, capO

    def _search_keys_classic_stream(
        self, packed_all: np.ndarray, qcounts: np.ndarray, k: int
    ) -> SearchResult | None:
        """Whole-batch classic sorted-row stream (host arrays in, one
        dispatch + one fetch). None when the kernel's residual capacity was
        exceeded, so search_keys falls through to the generic segments."""
        from .ops.stream_query import EPC_CL, stream_accumulate_classic_exact

        n = packed_all.shape[0]
        P0 = _round_up(n, EPC_CL)
        pk = np.zeros((P0, 2), dtype=np.uint32)
        pk[:n] = packed_all
        qc = np.zeros(P0, dtype=np.int32)
        qc[:n] = np.maximum(qcounts[:n], 1)
        C = self.index.n_colors
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),
                jnp.array([1, 0], dtype=jnp.int32),
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = _round_up(n, 1024)
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        stats, hist, oc_buf, of_buf, nd = stream_accumulate_classic_exact(
            stats, hist, oc_buf, of_buf,
            self.blocks2, self._blocks_bp,
            jnp.asarray(pk), jnp.asarray(qc),
            wpad=self.wpad, k=k, num_hash=self.index.num_hash,
            bloom_size=self.index.bloom_size, n_colors=C,
        )
        if int(np.asarray(nd)) > 0:
            return None
        # exact mode: overflow slots carry frequencies directly
        return self._collect(stats, hist, oc_buf, of_buf, capO, qcounts=None)

    def search_keys_dev_classic_async(self, pk_dev, qc_dev, k: int):
        """Device-resident classic sorted-row-stream dispatch — the fast
        path for reference-placement indexes. Same async contract as
        search_keys_dev_async (decode with search_keys_dev_finish; a None
        decode means residual capacity tripped, re-run via
        search_keys_dev_generic_async). P must be a multiple of EPC_CL."""
        from .ops.stream_query import EPC_CL, stream_accumulate_classic_exact

        if not self._stream_classic:
            raise ValueError(
                "search_keys_dev_classic requires a classic wpad==1 index"
            )
        if not (4 <= k <= 32):
            raise ValueError("device hashing needs 4 <= k <= 32")
        if pk_dev.dtype != jnp.uint32 or qc_dev.dtype != jnp.int32:
            raise ValueError(
                "search_keys_dev_classic expects uint32 packed k-mers and "
                f"int32 frequencies (0 = pad); got {pk_dev.dtype}/"
                f"{qc_dev.dtype}"
            )
        P0 = pk_dev.shape[0]
        if P0 % EPC_CL:
            raise ValueError(f"P must be a multiple of {EPC_CL}")
        C = self.index.n_colors
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),
                jnp.array([1, 0], dtype=jnp.int32),
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = _round_up(P0, 1024)
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        stats, hist, oc_buf, of_buf, nd = stream_accumulate_classic_exact(
            stats, hist, oc_buf, of_buf,
            self.blocks2, self._blocks_bp,
            pk_dev, qc_dev,
            wpad=self.wpad, k=k, num_hash=self.index.num_hash,
            bloom_size=self.index.bloom_size, n_colors=C,
        )
        vec = jnp.concatenate([stats, nd[None], hist.reshape(-1)])
        return vec, oc_buf, of_buf, capO

    def search_keys_dev_finish(
        self, host, oc_buf, of_buf, capO
    ) -> SearchResult | None:
        """Decode a fetched search_keys_dev_async vector (numpy) into a
        SearchResult; None when the drop guard tripped. Exact mode: the
        overflow list carries frequencies directly."""
        C = self.index.n_colors
        W = self.index.words_per_row
        sl = C + self.wpad + 2
        if int(host[sl]) > 0:  # capacity exceeded: generic path rerun
            return None
        st, hist_np = host[:sl], host[sl + 1 :].reshape(C, FREQ_CAP)
        counts = st[:C].astype(np.int64)
        and_all = st[C : C + W].astype(np.uint32)
        all_valid = bool(st[C + self.wpad])
        n_over = int(st[C + self.wpad + 1])
        none = np.zeros(0, dtype=np.int32)
        if n_over:
            kp = min(_round_up(n_over, 1024), capO)
            over_c = np.asarray(oc_buf[:kp])[:n_over]
            over_f = np.asarray(of_buf[:kp])[:n_over].astype(np.int32)
        else:
            over_c = over_f = none
        return SearchResult(
            counts, all_valid, and_all, hist_np.astype(np.int64),
            over_c, over_f,
        )

    def _collect(self, stats, hist, oc_buf, of_buf, capO, qcounts=None):
        """Fetch the device accumulators into a SearchResult. With a host
        ``qcounts`` copy, overflow slots hold global k-mer indices resolved
        against it; without one (device-resident counting) they hold the
        exact frequency directly."""
        C = self.index.n_colors
        W = self.index.words_per_row
        none = np.zeros(0, dtype=np.int32)
        st = np.asarray(stats)
        counts = st[:C].astype(np.int64)
        and_all = st[C : C + W].astype(np.uint32)
        all_valid = bool(st[C + self.wpad])
        n_over = int(st[C + self.wpad + 1])
        hist_np = np.asarray(hist).astype(np.int64)
        if n_over:
            kp = min(_round_up(n_over, 1024), capO)
            over_c = np.asarray(oc_buf[:kp])[:n_over]
            over_v = np.asarray(of_buf[:kp])[:n_over]
            if qcounts is not None:
                over_f = qcounts[over_v].astype(np.int32)
            else:
                over_f = over_v.astype(np.int32)
        else:
            over_c = none
            over_f = none
        return SearchResult(counts, all_valid, and_all, hist_np, over_c, over_f)

    def search_reads(
        self,
        reads_packed: np.ndarray,  # uint32 [R, ceil(L/16)] 2-bit read words
        lens: np.ndarray,  # int32 [R] true read lengths
        valid_bits: np.ndarray | None = None,  # uint32 [R, ceil(L/32)]
        *,
        k: int,
        L: int,
        filter_t: int = 0,
        d: int = 1,
    ) -> tuple[SearchResult, int]:
        """Search a batch of uppercase-ACGT reads shipped as 2-bit words.

        The device extracts canonical k-mer windows, counts them, applies
        the strictly-greater frequency filter (kmer.rs:826-837) and queries
        the index, all without the k-mers ever existing host-side
        (ops/extract.py): the host link carries ~0.27 bytes per read base
        instead of 10 bytes per unique k-mer. Returns (result, n_unique
        filtered k-mers). N/other invalid bases are handled exactly via the
        optional per-base validity bitplane (pack_reads_valid) — windows
        touching one are skipped like the reference's has_no_n check;
        lowercase-containing reads still need the exact host path (raw-byte
        canonical order is not 2-bit representable).
        """
        if not (4 <= k <= 32 and self.index.bloom_size < 2**31):
            raise ValueError("search_reads requires the device-hash envelope")
        if self._custom_place:
            raise ValueError(
                "search_reads device hashing does not cover shard-placed "
                "indexes on one device; use the sharded engine or search_keys"
            )
        n_windows = reads_packed.shape[0] * (L - k + 1)
        if n_windows >= 2**31:
            raise ValueError(
                f"read batch spans {n_windows} k-mer windows, beyond int32 "
                "device indexing; split the batch (R * (L - k + 1) must stay "
                "under 2^31)"
            )
        if self._stream and self.bv in (3, 4):  # value-addressed (monotone)
            max_w = int(
                os.environ.get("COLORID_FUSED_MAX_WINDOWS", 28_000_000)
            )
            if n_windows > max_w:
                # huge single fused dispatches can wedge the device link;
                # chunked pipeline: per-chunk extract+sort+compact, one
                # global merge+filter+stream (ops/fused_reads.py)
                out = self._search_reads_fused_chunked(
                    reads_packed, lens, valid_bits, k=k, L=L,
                    filter_t=filter_t, d=d, max_windows=max_w,
                )
            else:
                out = self._search_reads_fused(
                    reads_packed, lens, valid_bits, k=k, L=L,
                    filter_t=filter_t, d=d,
                )
            if out is not None:
                return out
        from .ops.extract import extract_count
        from .ops.query import query_accumulate_hash_scan_exact

        lens_j = (
            lens if isinstance(lens, jax.Array)
            else jnp.asarray(np.asarray(lens, dtype=np.int32))
        )
        pk, qc, n_u = extract_count(
            jnp.asarray(reads_packed),
            lens_j,
            None if valid_bits is None else jnp.asarray(valid_bits),
            k=k, L=L, filter_t=filter_t, d=d,
        )
        n = int(n_u)  # tiny scalar D2H; keys/counts stay device-resident
        C = self.index.n_colors
        W = self.index.words_per_row
        if n == 0:
            return (
                SearchResult(
                    np.zeros(C, dtype=np.int64), True,
                    np.full(W, 0xFFFFFFFF, dtype=np.uint32),
                    np.zeros((C, FREQ_CAP), dtype=np.int64),
                    np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32),
                ),
                0,
            )
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),
                jnp.array([1, 0], dtype=jnp.int32),
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = _round_up(n, 1024)
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        chunk = min(self.chunk, 1 << 20)
        seg = chunk * 8
        # padding slots beyond n_u already carry qcounts == 0 (the kernels'
        # padding marker); grow the arrays only if a segment overruns them
        need = 0
        for start in range(0, n, seg):
            m = min(start + seg, n) - start
            size = _round_up(m, chunk) if m > chunk else _round_up(
                m, min(self._minpad, chunk)
            )
            need = max(need, start + size)
        if need > pk.shape[0]:
            pad = need - pk.shape[0]
            pk = jnp.concatenate([pk, jnp.zeros((pad, 2), dtype=jnp.uint32)])
            qc = jnp.concatenate([qc, jnp.zeros(pad, dtype=jnp.int32)])
        for start in range(0, n, seg):
            m = min(start + seg, n) - start
            size = _round_up(m, chunk) if m > chunk else _round_up(
                m, min(self._minpad, chunk)
            )
            csize = chunk if m > chunk else size
            stats, hist, oc_buf, of_buf = query_accumulate_hash_scan_exact(
                stats,
                hist,
                oc_buf,
                of_buf,
                self.blocks2,
                pk[start : start + size],
                qc[start : start + size],
                wpad=self.wpad,
                chunk=csize,
                k=k,
                num_hash=self.index.num_hash,
                bloom_size=self.index.bloom_size,
                rpb=self.rpb,
                bv=self.bv or 1,
            )
        return self._collect(stats, hist, oc_buf, of_buf, capO), n

    def _search_reads_fused(
        self, reads_packed, lens, valid_bits=None, *, k, L, filter_t, d
    ) -> tuple[SearchResult, int] | None:
        """search_reads through the one-call fused pipeline
        (ops/fused_reads.py): extraction, exact counting and the
        sorted-stream query kernel in a single dispatch, on the v3
        (value-addressed) blocked layout. Returns None when the kernel's
        residual/overflow capacity was exceeded (pathological distributions
        only) so the caller falls back to the generic path."""
        from .ops.fused_reads import fused_search_reads
        from .ops.stream_query import OVER_CAP, RES_CAP

        C = self.index.n_colors
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),
                jnp.array([1, 0], dtype=jnp.int32),
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = OVER_CAP + RES_CAP
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        # device-resident reads/lens pass through untouched (np.asarray on a
        # jax array would pull it D2H every call)
        lens_j = (
            lens if isinstance(lens, jax.Array)
            else jnp.asarray(np.asarray(lens, dtype=np.int32))
        )
        stats, hist, oc_buf, of_buf, n_drop, n_u = fused_search_reads(
            stats, hist, oc_buf, of_buf,
            self.blocks2, self._blocks_bp,
            jnp.asarray(reads_packed),
            lens_j,
            None if valid_bits is None else jnp.asarray(valid_bits),
            k=k, L=L, filter_t=filter_t, d=d,
            wpad=self.wpad, num_hash=self.index.num_hash,
            bloom_size=self.index.bloom_size, rpb=self.rpb, n_colors=C,
            bv=self.bv,
        )
        return self._fused_finish(stats, hist, oc_buf, of_buf, n_drop, n_u,
                                  capO)

    def _search_reads_fused_chunked(
        self, reads_packed, lens, valid_bits=None, *, k, L, filter_t, d,
        max_windows,
    ) -> tuple[SearchResult, int] | None:
        """Chunked fused pipeline (ops/fused_reads.py dispatch A/A2/B): no
        single dispatch spans more than ~max_windows k-mer windows (huge
        fused programs wedge the device link). Per-chunk extract+sort
        pipelines, then compaction sized from the measured per-chunk unique
        counts, then one merge+global-filter+stream dispatch."""
        from .ops.fused_reads import (
            compact_sorted,
            extract_sorted_counts,
            fused_merge_query,
        )
        from .ops.stream_query import OVER_CAP, RES_CAP

        NW = L - k + 1
        R = reads_packed.shape[0]
        Rc = max(max_windows // NW, 1)
        S = -(-R // Rc)
        Rc = -(-R // S)  # balanced chunks sharing one jit shape
        reads_j = jnp.asarray(reads_packed)
        lens_j = (
            lens if isinstance(lens, jax.Array)
            else jnp.asarray(np.asarray(lens, dtype=np.int32))
        )
        vb_j = None if valid_bits is None else jnp.asarray(valid_bits)
        padR = S * Rc - R
        if padR:
            reads_j = jnp.concatenate(
                [reads_j, jnp.zeros((padR, reads_j.shape[1]), jnp.uint32)]
            )
            lens_j = jnp.concatenate([lens_j, jnp.zeros(padR, jnp.int32)])
            if vb_j is not None:
                vb_j = jnp.concatenate(
                    [vb_j, jnp.zeros((padR, vb_j.shape[1]), jnp.uint32)]
                )
        outs = [
            extract_sorted_counts(
                reads_j[s * Rc : (s + 1) * Rc],
                lens_j[s * Rc : (s + 1) * Rc],
                None if vb_j is None else vb_j[s * Rc : (s + 1) * Rc],
                k=k, L=L, d=d,
            )
            for s in range(S)
        ]
        n_max = max(int(np.asarray(o[3])) for o in outs)
        # power-of-two cap bounds the jit-shape count; never below 2^20 so
        # typical read chunks reuse one compiled compaction
        cap = min(1 << max(20, max(n_max, 1).bit_length()), Rc * NW)
        comps = [compact_sorted(o[0], o[1], o[2], cap=cap) for o in outs]
        C = self.index.n_colors
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),
                jnp.array([1, 0], dtype=jnp.int32),
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = OVER_CAP + RES_CAP
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        stats, hist, oc_buf, of_buf, n_drop, n_u = fused_merge_query(
            stats, hist, oc_buf, of_buf,
            self.blocks2, self._blocks_bp,
            jnp.stack([c[0] for c in comps]),
            jnp.stack([c[1] for c in comps]),
            jnp.stack([c[2] for c in comps]),
            k=k, filter_t=filter_t,
            wpad=self.wpad, num_hash=self.index.num_hash,
            bloom_size=self.index.bloom_size, rpb=self.rpb, n_colors=C,
            bv=self.bv,
        )
        return self._fused_finish(stats, hist, oc_buf, of_buf, n_drop, n_u,
                                  capO)

    def search_reads_fused_async(
        self, reads_dev, lens_dev, valid_bits=None, *,
        k: int, L: int, filter_t: int = 0, d: int = 1,
    ):
        """Dispatch half of the one-call fused reads search: returns (vec,
        oc_buf, of_buf, capO) with vec = concat([stats, n_drop, n_unique,
        hist.ravel()]) still on device, so callers can pipeline several
        dispatches and fetch them in one stacked D2H (same steady-state
        contract as search_keys_dev_async); decode with
        search_reads_fused_finish. Raises ValueError when the fused
        single-dispatch path is not eligible (non-value-addressed layout,
        device-hash envelope, or a window count past the wedge guard) —
        callers fall back to the synchronous search_reads."""
        from .ops.fused_reads import fused_search_reads
        from .ops.stream_query import OVER_CAP, RES_CAP

        if not (4 <= k <= 32 and self.index.bloom_size < 2**31):
            raise ValueError("fused async requires the device-hash envelope")
        if self._custom_place or not (self._stream and self.bv in (3, 4)):
            raise ValueError(
                "fused async requires a stream-eligible value-addressed "
                "(v3/v4) blocked index"
            )
        n_windows = reads_dev.shape[0] * (L - k + 1)
        max_w = int(os.environ.get("COLORID_FUSED_MAX_WINDOWS", 28_000_000))
        if n_windows > max_w:
            raise ValueError(
                f"{n_windows} windows exceeds the single-dispatch guard "
                f"({max_w}); use search_reads (chunked pipeline)"
            )
        C = self.index.n_colors
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),
                jnp.array([1, 0], dtype=jnp.int32),
            ]
        )
        hist = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
        capO = OVER_CAP + RES_CAP
        oc_buf = jnp.zeros(capO, dtype=jnp.int32)
        of_buf = jnp.zeros(capO, dtype=jnp.int32)
        lens_j = (
            lens_dev if isinstance(lens_dev, jax.Array)
            else jnp.asarray(np.asarray(lens_dev, dtype=np.int32))
        )
        stats, hist, oc_buf, of_buf, n_drop, n_u = fused_search_reads(
            stats, hist, oc_buf, of_buf,
            self.blocks2, self._blocks_bp,
            jnp.asarray(reads_dev),
            lens_j,
            None if valid_bits is None else jnp.asarray(valid_bits),
            k=k, L=L, filter_t=filter_t, d=d,
            wpad=self.wpad, num_hash=self.index.num_hash,
            bloom_size=self.index.bloom_size, rpb=self.rpb, n_colors=C,
            bv=self.bv,
        )
        vec = jnp.concatenate(
            [stats, n_drop[None], n_u[None], hist.reshape(-1)]
        )
        return vec, oc_buf, of_buf, capO

    def search_reads_fused_finish(
        self, host, oc_buf, of_buf, capO
    ) -> tuple[SearchResult, int] | None:
        """Decode a fetched search_reads_fused_async vector (numpy) into
        (SearchResult, n_unique); None when the drop guard tripped."""
        return self._fused_decode(np.asarray(host), oc_buf, of_buf, capO)

    def _fused_finish(
        self, stats, hist, oc_buf, of_buf, n_drop, n_u, capO
    ) -> tuple[SearchResult, int] | None:
        # ONE D2H round trip for everything but the (rare) overflow list:
        # the tunnel RTT is 100-500ms, so per-array fetches would dominate
        host = np.asarray(
            jnp.concatenate(
                [stats, n_drop[None], n_u[None], hist.reshape(-1)]
            )
        )
        return self._fused_decode(host, oc_buf, of_buf, capO)

    def _fused_decode(
        self, host, oc_buf, of_buf, capO
    ) -> tuple[SearchResult, int] | None:
        C = self.index.n_colors
        W = self.index.words_per_row
        sl = C + self.wpad + 2
        st, hist_np = host[:sl], host[sl + 2 :].reshape(C, FREQ_CAP)
        if int(host[sl]) > 0:  # n_drop: capacity exceeded, caller falls back
            return None
        counts = st[:C].astype(np.int64)
        and_all = st[C : C + W].astype(np.uint32)
        all_valid = bool(st[C + self.wpad])
        n_over = int(st[C + self.wpad + 1])
        none = np.zeros(0, dtype=np.int32)
        if n_over:
            kp = min(_round_up(n_over, 1024), capO)
            over_c = np.asarray(oc_buf[:kp])[:n_over]
            over_f = np.asarray(of_buf[:kp])[:n_over].astype(np.int32)
        else:
            over_c = over_f = none
        return (
            SearchResult(
                counts, all_valid, and_all, hist_np.astype(np.int64),
                over_c, over_f,
            ),
            int(host[sl + 1]),
        )

    def count_reads_histogram(
        self,
        reads_packed: np.ndarray,
        lens: np.ndarray,
        valid_bits: np.ndarray | None = None,
        *,
        k: int,
        L: int,
        d: int = 1,
        cap: int = 65536,
    ) -> np.ndarray:
        """Device-side per-unique-k-mer count histogram (auto_cutoff input;
        kmer.rs:866) — one [cap] int32 fetch instead of shipping counts."""
        from .ops.extract import count_histogram

        return np.asarray(
            count_histogram(
                jnp.asarray(reads_packed),
                jnp.asarray(np.asarray(lens, dtype=np.int32)),
                None if valid_bits is None else jnp.asarray(valid_bits),
                k=k, L=L, d=d, cap=cap,
            )
        )

    # -- read classifier (read_id hot loop) ----------------------------------

    def readid_counts(
        self,
        keys_per_read: list[np.ndarray],
        start_sample: int,
    ) -> np.ndarray:
        """Per-read per-color hit counts [B, C+1] (column C = no_hits),
        replicating search_index(_classic) semantics including the
        break-on-absent quirk and the -B candidate-set two-phase count."""
        C = self.index.n_colors
        n_reads = len(keys_per_read)
        if n_reads == 0:
            return np.zeros((0, C + 1), dtype=np.int32)
        seg_ids = []
        kmer_pos = []
        rows_parts = []
        for i, keys in enumerate(keys_per_read):
            kn = keys.shape[0]
            if kn == 0:
                continue
            seg_ids.append(np.full(kn, i, dtype=np.int32))
            kmer_pos.append(np.arange(kn, dtype=np.int32))
            rows_parts.append(self.rows_for_keys(keys))
        if not rows_parts:
            return np.zeros((n_reads, C + 1), dtype=np.int32)
        return self.readid_counts_arrays(
            np.concatenate(rows_parts, axis=0),
            np.concatenate(seg_ids),
            np.concatenate(kmer_pos),
            n_reads,
            start_sample,
        )

    def readid_firsthit(
        self,
        keys_per_read: list[np.ndarray],
        start_sample: int,
    ) -> np.ndarray:
        """First-hit position matrix [B, C+1] (column C = first-absent
        position; 2**30 = never) for keys given in set-iteration order —
        recovers the reference's final_report insertion order for the
        read_id tie-order fixup. Callers pass only the (rare) tied reads."""
        C = self.index.n_colors
        n_reads = len(keys_per_read)
        out = np.full((n_reads, C + 1), 2**30, dtype=np.int32)
        if n_reads == 0:
            return out
        seg_ids, kmer_pos, rows_parts = [], [], []
        for i, keys in enumerate(keys_per_read):
            kn = keys.shape[0]
            if kn == 0:
                continue
            seg_ids.append(np.full(kn, i, dtype=np.int32))
            kmer_pos.append(np.arange(kn, dtype=np.int32))
            rows_parts.append(self.rows_for_keys(keys))
        if not rows_parts:
            return out
        rows = np.concatenate(rows_parts, axis=0).astype(
            np.int64 if self._wide else np.int32, copy=False
        )
        seg = np.concatenate(seg_ids)
        pos = np.concatenate(kmer_pos)
        n = rows.shape[0]
        size = max(1 << (n - 1).bit_length(), 1024)
        rows_p = np.zeros((size, self.index.num_hash), dtype=rows.dtype)
        rows_p[:n] = rows
        seg_p = np.zeros(size, dtype=np.int32)
        seg_p[:n] = seg
        pos_p = np.full(size, PAD_POS, dtype=np.int32)
        pos_p[:n] = pos
        n_pad = max(1 << (n_reads - 1).bit_length(), 16)
        if self._wide:
            from .ops.query import query_readid_firsthit_wide, split_rows_wide

            blk, lane0 = split_rows_wide(rows_p, self.wpad)
            rep = query_readid_firsthit_wide(
                self.blocks2,
                jnp.asarray(blk),
                jnp.asarray(lane0),
                jnp.asarray(seg_p),
                jnp.asarray(pos_p),
                num_reads=n_pad,
                start_sample=start_sample,
                num_colors=C,
                wpad=self.wpad,
            )
        else:
            rep = query_readid_firsthit(
                self.blocks2,
                jnp.asarray(rows_p),
                jnp.asarray(seg_p),
                jnp.asarray(pos_p),
                num_reads=n_pad,
                start_sample=start_sample,
                num_colors=C,
                wpad=self.wpad,
                rpb=self.rpb,
            )
        out[:] = np.asarray(rep)[:n_reads]
        return out

    def readid_firsthit_reads(
        self,
        mates_packed: np.ndarray,
        mate_seg: np.ndarray,
        lens: np.ndarray,
        ranks: np.ndarray,
        n_reads: int,
        start_sample: int,
        k: int,
        L: int,
    ) -> np.ndarray:
        """readid_firsthit from 2-bit packed mates + the per-window rank
        plane (no host k-mer work; the tie-fixup path for reads-path
        groups). Same [B, C+1] contract as readid_firsthit."""
        return self.readid_firsthit_reads_async(
            mates_packed, mate_seg, lens, ranks, n_reads, start_sample, k, L
        )()

    def readid_firsthit_reads_async(
        self,
        mates_packed: np.ndarray,
        mate_seg: np.ndarray,
        lens: np.ndarray,
        ranks: np.ndarray,
        n_reads: int,
        start_sample: int,
        k: int,
        L: int,
    ):
        """readid_firsthit_reads with a deferred fetch (dispatch now,
        returned callable produces the matrix) so the classifier overlaps
        the tie-fixup round trip with other host work."""
        from .ops.query import query_readid_firsthit_reads

        C = self.index.n_colors
        M = mates_packed.shape[0]
        out = np.full((n_reads, C + 1), 2**30, dtype=np.int32)
        if M == 0:
            return lambda: out
        size = max(1 << (M - 1).bit_length(), 16)
        mp = np.zeros((size, mates_packed.shape[1]), dtype=np.uint32)
        mp[:M] = mates_packed
        sg = np.full(size, -1, dtype=np.int16)
        sg[:M] = np.asarray(mate_seg, dtype=np.int16)
        ln = np.zeros(size, dtype=np.int32)
        ln[:M] = lens
        none = 255 if ranks.dtype == np.uint8 else -1  # ops/query decode
        rk = np.full((size, ranks.shape[1]), none, dtype=ranks.dtype)
        rk[:M] = ranks
        n_pad = max(1 << (n_reads - 1).bit_length(), 16)
        rep = query_readid_firsthit_reads(
            self.blocks2,
            jnp.asarray(mp),
            jnp.asarray(sg),
            jnp.asarray(ln),
            jnp.asarray(rk),
            num_reads=n_pad,
            start_sample=start_sample,
            num_colors=C,
            wpad=self.wpad,
            k=k,
            L=L,
            num_hash=self.index.num_hash,
            bloom_size=self.index.bloom_size,
            rpb=self.rpb,
            bv=self.bv or 1,
        )

        def fetch() -> np.ndarray:
            out[:] = np.asarray(rep)[:n_reads]
            return out

        return fetch

    def readid_counts_packed(
        self,
        packed: np.ndarray,  # uint32 [N, 2]
        seg: np.ndarray,  # int16 [N] sorted asc
        pos: np.ndarray,  # int16 [N]
        n_reads: int,
        start_sample: int,
        k: int,
    ) -> np.ndarray:
        """readid counts with on-device hashing (12B/kmer host traffic)."""
        C = self.index.n_colors
        out = np.zeros((n_reads, C + 1), dtype=np.int32)
        READS = self._rid_reads
        # dispatch every chunk before fetching any result: jax dispatch is
        # async, so H2D, kernel, and D2H of successive chunks pipeline
        # instead of paying a link round-trip per chunk
        pending = []
        for r0 in range(0, n_reads, READS):
            r1 = min(r0 + READS, n_reads)
            lo = np.searchsorted(seg, r0, "left")
            hi = np.searchsorted(seg, r1, "left")
            n = hi - lo
            if n == 0:
                continue
            size = max(1 << (int(max(n, 1)) - 1).bit_length(), self._rid_floor)
            pk = np.zeros((size, 2), dtype=np.uint32)
            pk[:n] = packed[lo:hi]
            sg = np.zeros(size, dtype=np.int16)
            sg[:n] = seg[lo:hi] - np.int16(r0)
            ps = np.full(size, -1, dtype=np.int16)
            ps[:n] = pos[lo:hi]
            report = query_readid_hash_batch(
                self.blocks2,
                jnp.asarray(pk),
                jnp.asarray(sg),
                jnp.asarray(ps),
                num_reads=READS,
                start_sample=start_sample,
                num_colors=C,
                wpad=self.wpad,
                k=k,
                num_hash=self.index.num_hash,
                bloom_size=self.index.bloom_size,
                rpb=self.rpb,
                bv=self.bv or 1,
            )
            pending.append((r0, r1, report))
        for r0, r1, report in pending:
            out[r0:r1] = np.asarray(report)[: r1 - r0]
        return out

    def readid_counts_reads(
        self,
        mates_packed: np.ndarray,  # uint32 [M, ceil(L/16)]
        mate_seg: np.ndarray,  # int16/int32 [M] read id per mate, sorted asc
        lens: np.ndarray,  # int32 [M]
        ranks: np.ndarray,  # int16 [M, L-k+1]
        n_reads: int,
        start_sample: int,
        k: int,
        L: int,
    ) -> np.ndarray:
        """readid counts with device-side window extraction: the host ships
        2-bit packed mates + the per-window rank plane (~2.3B/window) instead
        of 12B per unique k-mer. Same [B, C+1] contract as readid_counts."""
        return self.readid_counts_reads_async(
            mates_packed, mate_seg, lens, ranks, n_reads, start_sample, k, L
        )()

    def readid_counts_reads_async(
        self,
        mates_packed: np.ndarray,
        mate_seg: np.ndarray,
        lens: np.ndarray,
        ranks: np.ndarray,
        n_reads: int,
        start_sample: int,
        k: int,
        L: int,
    ):
        """readid_counts_reads with a deferred fetch: all chunks dispatch
        now and the returned zero-arg callable produces the [B, C+1] matrix
        — the classifier overlaps the device round trip with host work
        (decision math, tie preparation)."""
        from .ops.query import query_readid_reads_batch

        C = self.index.n_colors
        out = np.zeros((n_reads, C + 1), dtype=np.int32)
        READS = self._rid_reads
        mate_seg = np.asarray(mate_seg, dtype=np.int32)
        NW = L - k + 1
        pending = []
        for r0 in range(0, n_reads, READS):
            r1 = min(r0 + READS, n_reads)
            lo = np.searchsorted(mate_seg, r0, "left")
            hi = np.searchsorted(mate_seg, r1, "left")
            m = hi - lo
            if m == 0:
                continue
            size = max(1 << (int(m) - 1).bit_length(), 2048)
            mp = np.zeros((size, mates_packed.shape[1]), dtype=np.uint32)
            mp[:m] = mates_packed[lo:hi]
            sg = np.full(size, -1, dtype=np.int16)
            sg[:m] = (mate_seg[lo:hi] - r0).astype(np.int16)
            ln = np.zeros(size, dtype=np.int32)
            ln[:m] = lens[lo:hi]
            none = 255 if ranks.dtype == np.uint8 else -1  # ops/query decode
            rk = np.full((size, NW), none, dtype=ranks.dtype)
            rk[:m] = ranks[lo:hi]
            report = query_readid_reads_batch(
                self.blocks2,
                jnp.asarray(mp),
                jnp.asarray(sg),
                jnp.asarray(ln),
                jnp.asarray(rk),
                num_reads=READS,
                start_sample=start_sample,
                num_colors=C,
                wpad=self.wpad,
                k=k,
                L=L,
                num_hash=self.index.num_hash,
                bloom_size=self.index.bloom_size,
                rpb=self.rpb,
                bv=self.bv or 1,
            )
            pending.append((r0, r1, report))

        def fetch() -> np.ndarray:
            for r0, r1, report in pending:
                out[r0:r1] = np.asarray(report)[: r1 - r0]
            return out

        return fetch

    def readid_counts_orderfree(
        self,
        mates_packed: np.ndarray,  # uint32 [M, ceil(L/16)]; M = n_reads*nm
        lens: np.ndarray,  # int32 [M]
        valid_bits: np.ndarray,  # uint32 [M, ceil(L/32)]
        n_reads: int,
        nm: int,
        k: int,
        L: int,
        d: int = 1,
    ) -> np.ndarray:
        """Order-free read classifier pass (ops/query.py::
        query_readid_orderfree_reads): the device dedups each read's
        canonical k-mer set itself, so the host ships ONLY packed mates —
        no hashbrown rank plane. Returns int32 [n_reads, C+3] (full counts,
        any-absent flag, distinct-k-mer count, zero-hit-k-mer count);
        pipelines/read_id.py decides which reads still need the exact
        set-order replay."""
        from .ops.query import query_readid_orderfree_reads

        C = self.index.n_colors
        out = np.zeros((n_reads, C + 3), dtype=np.int32)
        READS = self._rid_reads
        pending = []
        for r0 in range(0, n_reads, READS):
            r1 = min(r0 + READS, n_reads)
            nr = r1 - r0
            size = max(1 << (int(nr) - 1).bit_length(), 1024)
            mp = np.zeros((size * nm, mates_packed.shape[1]), dtype=np.uint32)
            mp[: nr * nm] = mates_packed[r0 * nm : r1 * nm]
            ln = np.zeros(size * nm, dtype=np.int32)
            ln[: nr * nm] = lens[r0 * nm : r1 * nm]
            vb = np.zeros((size * nm, valid_bits.shape[1]), dtype=np.uint32)
            vb[: nr * nm] = valid_bits[r0 * nm : r1 * nm]
            rep = query_readid_orderfree_reads(
                self.blocks2,
                jnp.asarray(mp),
                jnp.asarray(ln),
                jnp.asarray(vb),
                num_reads=size,
                num_colors=C,
                wpad=self.wpad,
                k=k,
                L=L,
                nm=nm,
                d=d,
                num_hash=self.index.num_hash,
                bloom_size=self.index.bloom_size,
                rpb=self.rpb,
                bv=self.bv or 1,
            )
            pending.append((r0, r1, rep))
        for r0, r1, rep in pending:
            out[r0:r1] = np.asarray(rep)[: r1 - r0]
        return out

    def readid_counts_arrays(
        self,
        rows: np.ndarray,
        seg: np.ndarray,
        pos: np.ndarray,
        n_reads: int,
        start_sample: int,
    ) -> np.ndarray:
        """Per-read counts from prepared flattened arrays (seg sorted asc).

        Chunks by reads so one device launch stays within a bounded k-mer
        budget and jit shapes stay cache-friendly."""
        C = self.index.n_colors
        out = np.zeros((n_reads, C + 1), dtype=np.int32)
        READS = self._rid_reads
        rows = rows.astype(np.int64 if self._wide else np.int32, copy=False)
        pending = []  # dispatch all chunks, then fetch (pipelined D2H)
        for r0 in range(0, n_reads, READS):
            r1 = min(r0 + READS, n_reads)
            lo = np.searchsorted(seg, r0, "left")
            hi = np.searchsorted(seg, r1, "left")
            n = hi - lo
            if n == 0:
                continue
            size = max(1 << (int(max(n, 1)) - 1).bit_length(), self._rid_floor)
            rows_p = np.zeros((size, self.index.num_hash), dtype=rows.dtype)
            rows_p[:n] = rows[lo:hi]
            seg_p = np.zeros(size, dtype=np.int32)
            seg_p[:n] = seg[lo:hi] - r0
            pos_p = np.full(size, PAD_POS, dtype=np.int32)
            pos_p[:n] = pos[lo:hi]
            if self._wide:
                from .ops.query import query_readid_batch_wide, split_rows_wide

                blk, lane0 = split_rows_wide(rows_p, self.wpad)
                report = query_readid_batch_wide(
                    self.blocks2,
                    jnp.asarray(blk),
                    jnp.asarray(lane0),
                    jnp.asarray(seg_p),
                    jnp.asarray(pos_p),
                    num_reads=READS,
                    start_sample=start_sample,
                    num_colors=C,
                    wpad=self.wpad,
                )
            else:
                report = query_readid_batch(
                    self.blocks2,
                    jnp.asarray(rows_p),
                    jnp.asarray(seg_p),
                    jnp.asarray(pos_p),
                    num_reads=READS,
                    start_sample=start_sample,
                    num_colors=C,
                    wpad=self.wpad,
                    rpb=self.rpb,
                )
            pending.append((r0, r1, report))
        for r0, r1, report in pending:
            out[r0:r1] = np.asarray(report)[: r1 - r0]
        return out
