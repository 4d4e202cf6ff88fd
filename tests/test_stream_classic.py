"""Classic (reference-placement) sorted-row-stream kernel parity.

The classic layout stores each hash's row independently
(simple_bloom.rs:19-26); stream_accumulate_classic_exact sorts the H*N row
probes, streams matrix tiles through a Pallas window, un-sorts, and
recombines with the shared accumulate tail. Its SearchResult must match
the generic gather bit-for-bit on dense AND sparse probe distributions
(the sparse case exercises the chunk-granular residual patch).
"""

import os

import numpy as np
import pytest

from colorid_tpu import native
from colorid_tpu.core.dna import UPPER
from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.engine import QueryEngine
from colorid_tpu.pipelines.build import build_index

REFS = "/root/reference/test_data/refs"
K = 27


def _query_batch(n_reads=400, L=2000):
    g = "".join(
        read_fasta(os.path.join(REFS, "Listeria_phage_B056.fasta"))
    )
    gb = UPPER[np.frombuffer(g.encode(), dtype=np.uint8)]
    rng = np.random.default_rng(11)
    starts = rng.integers(0, len(gb) - L, n_reads)
    reads = gb[starts[:, None] + np.arange(L)]
    nc = native.NativeCounter(K)
    assert nc.add_many(np.ascontiguousarray(reads))
    packed, qcounts = nc.dump_packed(0)
    return packed, np.maximum(qcounts, 1).astype(np.int32)


def _index(bloom, num_hash=4):
    refs = {
        f[:-6]: [os.path.join(REFS, f)]
        for f in sorted(os.listdir(REFS))
        if f.endswith(".fasta")
    }
    return build_index(refs, bloom, num_hash, K, verbose=False)


def _assert_same(a, b):
    assert (a.counts == b.counts).all()
    assert a.all_valid == b.all_valid
    assert (a.and_all == b.and_all).all()
    assert a.freq_stats() == b.freq_stats()


@pytest.mark.parametrize(
    "bloom,num_hash",
    [
        (375_000, 4),  # dense probes: almost everything in-window
        (3_000_000, 4),  # sparse: every chunk needs the residual patch
        (375_000, 3),  # non-power-of-two hash count
        (750_000, 1),
    ],
)
def test_classic_stream_matches_generic(bloom, num_hash):
    index = _index(bloom, num_hash)
    engine = QueryEngine(index, chunk=1 << 16)
    assert engine._stream_classic
    packed, qcounts = _query_batch()
    res = engine._search_keys_classic_stream(packed, qcounts, K)
    assert res is not None, "residual capacity tripped unexpectedly"
    engine._stream_classic = False
    try:
        ref = engine.search_keys(None, qcounts=qcounts, packed_all=packed, k=K)
    finally:
        engine._stream_classic = True
    _assert_same(res, ref)


def test_classic_stream_dev_async():
    import jax.numpy as jnp

    from colorid_tpu.ops.stream_query import EPC_CL

    index = _index(375_000, 4)
    engine = QueryEngine(index, chunk=1 << 16)
    packed, qcounts = _query_batch()
    n = packed.shape[0]
    P0 = ((n + EPC_CL - 1) // EPC_CL) * EPC_CL
    pk = np.zeros((P0, 2), dtype=np.uint32)
    pk[:n] = packed
    qc = np.zeros(P0, dtype=np.int32)
    qc[:n] = qcounts
    vec, oc, of, capO = engine.search_keys_dev_classic_async(
        jnp.asarray(pk), jnp.asarray(qc), k=K
    )
    res = engine.search_keys_dev_finish(np.asarray(vec), oc, of, capO)
    assert res is not None
    engine._stream_classic = False
    ref = engine.search_keys(None, qcounts=qcounts, packed_all=packed, k=K)
    _assert_same(res, ref)


def test_classic_stream_routes_in_search_keys(monkeypatch):
    """COLORID_STREAM=force routes eligible classic queries through the
    stream path inside search_keys itself (the CLI search surface)."""
    index = _index(375_000, 4)
    packed, qcounts = _query_batch()
    engine = QueryEngine(index, chunk=1 << 16)
    monkeypatch.setenv("COLORID_STREAM", "force")
    res = engine.search_keys(None, qcounts=qcounts, packed_all=packed, k=K)
    monkeypatch.setenv("COLORID_STREAM", "0")
    engine._stream_classic = False
    ref = engine.search_keys(None, qcounts=qcounts, packed_all=packed, k=K)
    _assert_same(res, ref)


def test_classic_stream_overflow_freqs():
    """Uniq-hit frequencies >= FREQ_CAP route through the exact-mode
    overflow list; freq_stats must still be exact."""
    index = _index(375_000, 4)
    engine = QueryEngine(index, chunk=1 << 16)
    packed, qcounts = _query_batch()
    rng = np.random.default_rng(5)
    big = rng.random(qcounts.shape[0]) < 0.01
    qcounts = qcounts.copy()
    qcounts[big] = rng.integers(1024, 70_000, int(big.sum()))
    res = engine._search_keys_classic_stream(packed, qcounts, K)
    assert res is not None
    assert res.over_colors.size > 0
    engine._stream_classic = False
    ref = engine.search_keys(None, qcounts=qcounts, packed_all=packed, k=K)
    _assert_same(res, ref)
