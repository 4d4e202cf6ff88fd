"""Row-sharded sorted-stream query (VERDICT r3 #7).

The value-addressed blocked layouts (v3/v4) keep a k-mer's rows in one
block and address blocks monotonically in the k-mer value, so a sorted
probe stream partitions into contiguous per-shard slices and the
single-device stream kernel runs per device with only a stats merge
(parallel/sharded.py::stream_batch_rowshard). These tests pin the sharded
stream path bit-exact against the single-device engine on an 8-device CPU
mesh.
"""

import numpy as np
import pytest

from colorid_tpu.engine import QueryEngine
from colorid_tpu.parallel.engine import ShardedQueryEngine
from colorid_tpu.parallel.sharded import make_mesh
from colorid_tpu.pipelines.build import build_index

REFS = "/root/reference/test_data/refs"
ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)
K = 27


@pytest.fixture(scope="module")
def v4_index():
    import os

    refs = {}
    for f in sorted(os.listdir(REFS)):
        if f.endswith(".fasta"):
            refs[f[:-6]] = [os.path.join(REFS, f)]
    idx = build_index(refs, 750_000, 4, K, verbose=False, blocked=True)
    assert idx.blocked == 4
    return idx


def _query(v4_index, n=30_000, seed=2):
    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.core.kmers import canonical_windows

    rng = np.random.default_rng(seed)
    g = np.frombuffer(
        "".join(
            read_fasta(f"{REFS}/Listeria_phage_B056.fasta")
        ).upper().encode(),
        dtype=np.uint8,
    )
    w = canonical_windows(g, K)
    keys = np.concatenate(
        [
            w[rng.integers(0, w.shape[0], n // 2)],
            ACGT[rng.integers(0, 4, (n // 2, K))],
        ]
    )
    _, idx = np.unique(keys, axis=0, return_index=True)
    keys = keys[np.sort(idx)]
    qc = rng.integers(1, 2000, keys.shape[0]).astype(np.int32)
    return keys, qc


@pytest.mark.parametrize("nd,nr", [(2, 4), (1, 8)])
def test_sharded_stream_matches_single_device(v4_index, nd, nr):
    keys, qc = _query(v4_index)
    single = QueryEngine(v4_index)
    single._stream = False  # generic exact path as the oracle
    try:
        want = single.search_keys(keys, qcounts=qc)
    finally:
        single._stream = True

    mesh = make_mesh(nd, nr, "row")
    eng = ShardedQueryEngine(v4_index, mesh=mesh, layout="row", n_data=nd)
    assert eng._planes is not None, "stream path must be eligible"
    got = eng.search_keys(keys, qcounts=qc)
    assert (got.counts == want.counts).all()
    assert got.all_valid == want.all_valid
    assert (got.and_all == want.and_all).all()
    assert got.freq_stats() == want.freq_stats()


def test_sharded_stream_disabled_env(v4_index, monkeypatch):
    """COLORID_STREAM=0 must route the sharded engine to the generic path
    and produce identical results (the fallback used on ndrop overflow)."""
    keys, qc = _query(v4_index, n=6000, seed=9)
    mesh = make_mesh(2, 4, "row")
    eng = ShardedQueryEngine(v4_index, mesh=mesh, layout="row", n_data=2)
    got_s = eng.search_keys(keys, qcounts=qc)
    monkeypatch.setenv("COLORID_STREAM", "0")
    got_g = eng.search_keys(keys, qcounts=qc)
    assert (got_s.counts == got_g.counts).all()
    assert got_s.freq_stats() == got_g.freq_stats()
    assert (got_s.and_all == got_g.and_all).all()
