"""Multi-device query engine over a ("data", "color"|"row") mesh.

Drop-in for engine.QueryEngine.search_keys when more than one device is
available: the bit-slice matrix shards across the model axis (color slices
keep gathers device-local; row slices scale memory), k-mer batches split
across the data axis, and per-color counts merge with psum over the
interconnect. Returns the same SearchResult contract (exact uniq-hit
frequency statistics), with the per-k-mer uniq colors assembled host-side.

Multi-host: call parallel.distributed.initialize() first so jax.devices()
spans all hosts; the same mesh code then lays shards across ICI/DCN.
"""

from __future__ import annotations

import numpy as np

from ..engine import SearchResult, _round_up
from ..hashing.xxh3 import bloom_rows_batch
from ..index.bigsi import BigsiIndex
from ..ops.query import FREQ_CAP
from . import sharded


class ShardedQueryEngine:
    def __init__(
        self,
        index: BigsiIndex,
        mesh=None,
        layout: str = "color",
        n_data: int = 1,
        chunk: int = 1 << 18,
        sharded_matrix: tuple | None = None,
    ):
        import jax

        self.index = index
        self.layout = layout
        self.chunk = chunk
        if mesh is None:
            n = len(jax.devices())
            mesh = sharded.make_mesh(n_data, n // n_data, layout)
        self.mesh = mesh
        if sharded_matrix is not None:
            # device-resident blocks from a row-sharded build
            # (ops/build_ops.py::build_matrix_rowshard + pack_blocks_rowshard):
            # the full matrix never touches the host; index.matrix may be None
            if layout != "row":
                raise ValueError("sharded_matrix requires layout='row'")
            self.mat, self.wpad, self.Rl = sharded_matrix
            return
        matrix = np.asarray(index.matrix)
        if layout == "color":
            self.mat, self.wpad, self.Wl = sharded.device_put_colorshard(
                matrix, mesh
            )
        else:
            self.mat, self.wpad, self.Rl = sharded.device_put_rowshard(
                matrix, mesh
            )

    def _rows(self, keys: np.ndarray) -> np.ndarray:
        from .. import native

        if self.index.blocked:
            # blocked placement still yields plain row indices; the sharded
            # kernels gather generically (the single-fetch fast path is a
            # single-device specialization)
            from ..ops.blocked import blocked_rows_host, rows_per_block

            wpad = 1 << (max(self.index.words_per_row, 1) - 1).bit_length()
            rpb = rows_per_block(wpad)
            return blocked_rows_host(
                keys, self.index.num_hash, self.index.bloom_size, rpb,
                version=int(self.index.blocked),
            ).astype(np.int32)
        if keys.shape[0] and native.available():
            return native.xxh3_rows(
                keys, self.index.num_hash, self.index.bloom_size
            ).astype(np.int32)
        return bloom_rows_batch(
            keys, self.index.num_hash, self.index.bloom_size
        ).astype(np.int32)

    def search_keys(
        self, keys: np.ndarray, qcounts: np.ndarray | None = None
    ) -> SearchResult:

        index = self.index
        C = index.n_colors
        W = index.words_per_row
        n = keys.shape[0]
        counts = np.zeros(C, dtype=np.int64)
        and_all = np.full(W, 0xFFFFFFFF, dtype=np.uint32)
        hist = np.zeros((C, FREQ_CAP), dtype=np.int64)
        none = np.zeros(0, dtype=np.int32)
        if n == 0:
            return SearchResult(counts, True, and_all, hist, none, none)
        if qcounts is None:
            qcounts = np.ones(n, dtype=np.int32)
        rows_all = self._rows(keys)
        uniq_color = np.full(n, -1, dtype=np.int32)
        all_valid = True
        nd = self.mesh.shape["data"]
        step = self.chunk
        for start in range(0, n, step):
            stop = min(start + step, n)
            m = stop - start
            size = _round_up(m, max(nd * 8, 1024))
            rows = np.zeros((size, index.num_hash), dtype=np.int32)
            rows[:m] = rows_all[start:stop]
            mask = np.zeros(size, dtype=bool)
            mask[:m] = True
            if self.layout == "color":
                c, u, _v, aa, av = sharded.query_batch_colorshard(
                    self.mat, rows, mask,
                    mesh=self.mesh, wpad=self.wpad, Wl=self.Wl,
                )
                nm = self.mesh.shape["color"]
                cc = (
                    np.asarray(c).reshape(nm, -1)[:, : self.Wl * 32].reshape(-1)
                )
                counts += cc[:C].astype(np.int64)
                aw = (
                    np.asarray(aa).reshape(nm, -1)[:, : self.Wl].reshape(-1)[:W]
                )
                and_all &= aw
            else:
                c, u, _v, aa, av = sharded.query_batch_rowshard(
                    self.mat, rows, mask,
                    mesh=self.mesh, wpad=self.wpad, Rl=self.Rl,
                    W=W,
                )
                counts += np.asarray(c)[:C].astype(np.int64)
                and_all &= np.asarray(aa)[:W]
            uniq_color[start:stop] = np.asarray(u)[:m]
            all_valid = all_valid and bool(av)
        # exact uniq-hit frequency stats, host-side
        over_c: list[int] = []
        over_f: list[int] = []
        sel = uniq_color >= 0
        uc = uniq_color[sel]
        uq = np.asarray(qcounts, dtype=np.int64)[sel]
        small = uq < FREQ_CAP
        np.add.at(hist, (uc[small], uq[small]), 1)
        for c0, f0 in zip(uc[~small], uq[~small]):
            over_c.append(int(c0))
            over_f.append(int(f0))
        return SearchResult(
            counts,
            all_valid,
            and_all,
            hist,
            np.asarray(over_c, dtype=np.int32),
            np.asarray(over_f, dtype=np.int32),
        )
