"""Color-sharded sorted-stream query (shard-placed v3/v4 indexes).

A 4096-color index is wider than the single-device stream kernel's
1024-color cap; with `build --color-shards N` placement the stream kernel
runs per color shard on a ("data", "color") mesh
(sharded.py::stream_batch_colorshard). Bit-exact cross-check against the
single-device generic gather on the same index, including presence
semantics, uniq-hit frequency stats, overflow frequencies, and the
residual (out-of-window) patch.
"""

import numpy as np
import pytest

from colorid_tpu.engine import QueryEngine
from colorid_tpu.index.bigsi import BigsiIndex
from colorid_tpu.ops.blocked import rows_per_block
from colorid_tpu.ops.query import row_wpad
from colorid_tpu.parallel import sharded
from colorid_tpu.parallel.engine import ShardedQueryEngine


def _eng(index, n_data, n_shards):
    mesh = sharded.make_mesh(n_data, n_shards, "color")
    return ShardedQueryEngine(index, mesh=mesh, layout="color")

K = 31


def _mk_index(C, R, num_hash, n_shards, seed=0):
    rng = np.random.default_rng(seed)
    W = (C + 31) // 32
    wpad_l = row_wpad(-(-W // n_shards))
    place = rows_per_block(wpad_l)
    # sparse-ish random matrix: ~25% of words nonzero, some rows all-zero
    matrix = np.where(
        rng.random((R, W)) < 0.25,
        rng.integers(1, 2**32, (R, W), dtype=np.uint64).astype(np.uint32),
        np.uint32(0),
    )
    zero_rows = rng.integers(0, R, R // 20)
    matrix[zero_rows] = 0
    colors = [f"c{i}" for i in range(C)]
    return BigsiIndex(
        bloom_size=R,
        num_hash=num_hash,
        k_size=K,
        m_size=0,
        colors=colors,
        n_ref_kmers={c: 1000 for c in colors},
        matrix=matrix,
        blocked=4,
        place_rpb=place,
    )


def _mk_keys(n, seed=1):
    rng = np.random.default_rng(seed)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), (n, K))
    qc = rng.integers(1, 60, n).astype(np.int32)
    big = rng.random(n) < 0.002
    qc[big] = rng.integers(1024, 50_000, int(big.sum()))
    return keys, qc


def _assert_same(a, b):
    assert (a.counts == b.counts).all()
    assert a.all_valid == b.all_valid
    assert (a.and_all == b.and_all).all()
    assert a.freq_stats() == b.freq_stats()


@pytest.mark.parametrize(
    "num_hash,n_data,n_shards",
    [
        (2, 1, 4),  # 4096 colors on a (1, 4) mesh (VERDICT r4 #4 shape)
        (2, 2, 4),  # data x color
        (4, 1, 8),  # H=4 needs 512-color shards (split-lane grp >= 2)
    ],
)
def test_colorshard_stream_matches_single_device(num_hash, n_data, n_shards):
    C, R = 4096, 32768
    index = _mk_index(C, R, num_hash, n_shards)
    keys, qc = _mk_keys(14_000)
    ref = QueryEngine(index, chunk=1 << 14).search_keys(keys, qcounts=qc)
    eng = _eng(index, n_data, n_shards)
    assert eng._planes is not None, "stream path not eligible"
    res = eng._try_stream_keys(keys, qc)
    assert res is not None, "stream path fell back unexpectedly"
    _assert_same(res, ref)
    if (n_data, n_shards) == (1, 4):
        # the public entry must route through the stream and agree too
        _assert_same(eng.search_keys(keys, qcounts=qc), ref)


def test_colorshard_stream_sparse_residuals():
    """A sparse probe batch leaves out-of-window probes in most chunks;
    the chunk-granular raw residual patch must keep results exact."""
    C, R = 4096, 131072
    index = _mk_index(C, R, 2, 4, seed=3)
    keys, qc = _mk_keys(4_000, seed=4)
    ref = QueryEngine(index, chunk=1 << 14).search_keys(keys, qcounts=qc)
    eng = _eng(index, 1, 4)
    res = eng._try_stream_keys(keys, qc)
    if res is None:
        pytest.skip("residual capacity exceeded (acceptable fallback)")
    _assert_same(res, ref)


def test_colorshard_generic_still_matches():
    """The non-stream sharded path on a shard-placed index must also agree
    (placement-aware row hashing in ShardedQueryEngine._rows)."""
    C, R = 2048, 32768
    index = _mk_index(C, R, 2, 2, seed=5)
    keys, qc = _mk_keys(12_000, seed=6)
    ref = QueryEngine(index, chunk=1 << 14).search_keys(keys, qcounts=qc)
    eng = _eng(index, 2, 2)
    import os

    os.environ["COLORID_STREAM"] = "0"
    try:
        res = eng.search_keys(keys, qcounts=qc)
    finally:
        del os.environ["COLORID_STREAM"]
    _assert_same(res, ref)
