"""QueryEngine: device-resident index + chunked query execution.

Hosts the bit-slice matrix in device HBM once and streams fixed-shape
(jit-cache-friendly) k-mer batches through the fused gather/AND/count
kernels. All string work and XXH3 hashing happen host-side; only dense
integer tensors cross the host→device boundary.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import native
from .hashing.xxh3 import bloom_rows_batch
from .index.bigsi import BigsiIndex
from .ops.query import (
    PAD_POS,
    pack_matrix_blocks,
    query_accumulate,
    query_batch,
    query_batch_compact,
    query_readid_batch,
)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclass
class SearchResult:
    counts: np.ndarray  # int64 [C] per-color hit counts
    uniq_color: np.ndarray  # int32 [N] unique-hit color per k-mer or -1
    all_valid: bool  # every query k-mer had all rows present
    and_all: np.ndarray  # uint32 [W] global AND over k-mers


class QueryEngine:
    """Executes the BIGSI hot loop on one device."""

    def __init__(self, index: BigsiIndex, chunk: int = 1 << 20):
        self.index = index
        self.chunk = chunk
        blocks, self.wpad = pack_matrix_blocks(np.asarray(index.matrix))
        self.blocks2 = jnp.asarray(blocks)
        if index.bloom_size * self.wpad >= 2**31:
            raise ValueError(
                "bloom_size * padded_row_words >= 2^31 unsupported (int32 "
                "word addressing); shard colors across devices instead"
            )

    # -- hashing ------------------------------------------------------------

    def rows_for_keys(self, keys: np.ndarray) -> np.ndarray:
        """XXH3 row indices [N, H] for canonical k-mer byte rows [N, k]."""
        if keys.shape[0] and native.available():
            return native.xxh3_rows(
                keys, self.index.num_hash, self.index.bloom_size
            ).astype(np.int32)
        return bloom_rows_batch(
            keys, self.index.num_hash, self.index.bloom_size
        ).astype(np.int32)

    # -- search (batch_search_pe / perfect_search hot loop) ------------------

    def search_keys(
        self, keys: np.ndarray, rows_all: np.ndarray | None = None
    ) -> SearchResult:
        """Per-color counts + unique-hit colors for a set of k-mers.

        The whole query accumulates on device (donated stats + compacted
        unique-hit buffers, ops/query.py::query_accumulate); the host fetches
        once at the end. On a thin host↔device link per-batch readback would
        otherwise dominate the hot loop."""
        n = keys.shape[0] if rows_all is None else rows_all.shape[0]
        C = self.index.n_colors
        W = self.index.words_per_row
        counts = np.zeros(C, dtype=np.int64)
        uniq_color = np.full(n, -1, dtype=np.int32)
        and_all = np.full(W, 0xFFFFFFFF, dtype=np.uint32)
        if n == 0:
            return SearchResult(counts, uniq_color, True, and_all)
        if rows_all is None:
            rows_all = self.rows_for_keys(keys)
        stats = jnp.concatenate(
            [
                jnp.zeros(C, dtype=jnp.int32),
                jnp.full(self.wpad, -1, dtype=jnp.int32),  # and-words
                jnp.array([1, 0], dtype=jnp.int32),  # ok, n_uniq
            ]
        )
        cap = _round_up(n, 1024)
        ui_buf = jnp.zeros(cap, dtype=jnp.int32)
        uc_buf = jnp.zeros(cap, dtype=jnp.int32)
        for start in range(0, n, self.chunk):
            stop = min(start + self.chunk, n)
            m = stop - start
            size = self.chunk if n > self.chunk else _round_up(m, 1024)
            rows = np.zeros((size, self.index.num_hash), dtype=np.int32)
            rows[:m] = rows_all[start:stop]
            mask = np.zeros(size, dtype=bool)
            mask[:m] = True
            stats, ui_buf, uc_buf = query_accumulate(
                stats,
                ui_buf,
                uc_buf,
                self.blocks2,
                jnp.asarray(rows),
                jnp.asarray(mask),
                jnp.int32(start),
                wpad=self.wpad,
            )
        st = np.asarray(stats)
        counts += st[:C].astype(np.int64)
        and_all &= st[C : C + W].astype(np.uint32)
        all_valid = bool(st[C + self.wpad])
        k = int(st[C + self.wpad + 1])
        if k:
            kp = min(_round_up(k, 1024), cap)
            idx = np.asarray(ui_buf[:kp])[:k]
            col = np.asarray(uc_buf[:kp])[:k]
            uniq_color[idx] = col
        return SearchResult(counts, uniq_color, all_valid, and_all)

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
        READS = 2048
        rows = rows.astype(np.int32, copy=False)
        for r0 in range(0, n_reads, READS):
            r1 = min(r0 + READS, n_reads)
            lo = np.searchsorted(seg, r0, "left")
            hi = np.searchsorted(seg, r1, "left")
            n = hi - lo
            if n == 0:
                continue
            size = _round_up(n, 65536)
            rows_p = np.zeros((size, self.index.num_hash), dtype=np.int32)
            rows_p[:n] = rows[lo:hi]
            seg_p = np.zeros(size, dtype=np.int32)
            seg_p[:n] = seg[lo:hi] - r0
            pos_p = np.full(size, PAD_POS, dtype=np.int32)
            pos_p[:n] = pos[lo:hi]
            report = query_readid_batch(
                self.blocks2,
                jnp.asarray(rows_p),
                jnp.asarray(seg_p),
                jnp.asarray(pos_p),
                num_reads=READS,
                start_sample=start_sample,
                num_colors=C,
                wpad=self.wpad,
            )
            out[r0:r1] = np.asarray(report)[: r1 - r0]
        return out
