"""Row-sharded build on an 8-device CPU mesh: the matrix is born sharded
(P("row", None)), packs shard-locally, and queries bit-exactly — without the
full matrix ever existing on one device or the host."""

import jax
import numpy as np
import pytest

from colorid_tpu.index.bigsi import BigsiIndex
from colorid_tpu.ops.build_ops import build_matrix_rowshard, pack_blocks_rowshard
from colorid_tpu.parallel import sharded
from colorid_tpu.parallel.engine import ShardedQueryEngine

BLOOM, H, K, C = 5000, 3, 21, 10


@pytest.fixture(scope="module")
def built():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(11)
    row_lists = [
        rng.integers(0, BLOOM, rng.integers(200, 900)).astype(np.int64)
        for _ in range(C)
    ]
    mesh = sharded.make_mesh(1, 8, "row")
    mat, Rl = build_matrix_rowshard(row_lists, BLOOM, mesh, pad_to=1024)
    # host oracle
    W = (C + 31) // 32
    host = np.zeros((BLOOM, W), dtype=np.uint32)
    for c, rl in enumerate(row_lists):
        host[np.unique(rl), c // 32] |= np.uint32(1 << (c % 32))
    return mesh, mat, Rl, host


def test_rowshard_build_matches_host(built):
    mesh, mat, Rl, host = built
    got = np.asarray(mat)
    np.testing.assert_array_equal(got[:BLOOM], host)
    assert not got[BLOOM:].any()


def test_rowshard_pack_matches_device_put(built):
    mesh, mat, Rl, host = built
    W = host.shape[1]
    blocks = pack_blocks_rowshard(mat, mesh=mesh, Rl=Rl, W=W)
    ref_blocks, wpad, Rl2 = sharded.device_put_rowshard(host, mesh)
    assert Rl2 == Rl
    np.testing.assert_array_equal(np.asarray(blocks), np.asarray(ref_blocks))


def test_rowshard_engine_query_without_host_matrix(built):
    mesh, mat, Rl, host = built
    rng = np.random.default_rng(12)
    W = host.shape[1]
    from colorid_tpu.ops.query import row_wpad

    blocks = pack_blocks_rowshard(mat, mesh=mesh, Rl=Rl, W=W)
    names = [f"g{i}" for i in range(C)]
    meta = BigsiIndex(BLOOM, H, K, 0, names, {n: 100 for n in names}, None)
    eng = ShardedQueryEngine(
        meta, mesh=mesh, layout="row", chunk=2048,
        sharded_matrix=(blocks, row_wpad(W), Rl),
    )
    full = BigsiIndex(BLOOM, H, K, 0, names, {n: 100 for n in names}, host)
    ref = ShardedQueryEngine(full, mesh=mesh, layout="row", chunk=2048)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(800, K))
    qc = rng.integers(1, 2000, 800).astype(np.int32)
    a = eng.search_keys(keys, qcounts=qc)
    b = ref.search_keys(keys, qcounts=qc)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_array_equal(a.and_all, b.and_all)
    np.testing.assert_array_equal(a.freq_hist, b.freq_hist)
    assert a.all_valid == b.all_valid
    assert a.freq_stats() == b.freq_stats()
