"""Sorted-stream Pallas query kernel (ops/stream_query.py): parity with the
generic gather path on blocked-v2 indexes, incl. multi-word colors, the
frequency-overflow list, and the out-of-window residual pass."""

import os

import numpy as np
import pytest

from colorid_tpu.engine import QueryEngine
from colorid_tpu.index.bigsi import BigsiIndex
from colorid_tpu.ops.blocked import pad_bloom_size


def _rand_index(rng, C, bloom_size, num_hash=4, zero_frac=0.3):
    bloom = pad_bloom_size(bloom_size)
    W = (C + 31) // 32
    matrix = rng.integers(0, 2**32, (bloom, W), dtype=np.uint32)
    if C % 32:
        matrix[:, W - 1] &= np.uint32((1 << (C % 32)) - 1)
    matrix[rng.integers(0, bloom, int(bloom * zero_frac))] = 0
    names = [f"c{i}" for i in range(C)]
    return BigsiIndex(
        bloom, num_hash, 31, 0, names, {n: 1 for n in names}, matrix,
        blocked=2,
    )


def _compare(index, keys, qcounts, monkeypatch):
    monkeypatch.setenv("COLORID_STREAM", "0")
    base = QueryEngine(index).search_keys(keys, qcounts=qcounts)
    monkeypatch.setenv("COLORID_STREAM", "force")
    eng = QueryEngine(index)
    assert eng._stream, "stream kernel not eligible"
    got = eng.search_keys(keys, qcounts=qcounts)
    np.testing.assert_array_equal(got.counts, base.counts)
    np.testing.assert_array_equal(got.and_all, base.and_all)
    assert got.all_valid == base.all_valid
    assert got.freq_stats() == base.freq_stats()
    return base


def test_stream_parity_single_word(monkeypatch):
    rng = np.random.default_rng(7)
    index = _rand_index(rng, 21, 100_000)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(20000, 31))
    # frequencies straddle FREQ_CAP so the overflow list is exercised
    qcounts = rng.integers(1, 3000, 20000).astype(np.int32)
    base = _compare(index, keys, qcounts, monkeypatch)
    assert base.counts.sum() > 0


def test_stream_parity_multiword(monkeypatch):
    rng = np.random.default_rng(11)
    index = _rand_index(rng, 100, 60_000, zero_frac=0.5)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(16384, 27))
    qcounts = rng.integers(1, 50, 16384).astype(np.int32)
    base = _compare(index, keys, qcounts, monkeypatch)
    assert base.counts.sum() > 0


def test_stream_sparse_residual(monkeypatch):
    # Few probes over a large matrix: sorted chunks span many tiles, so most
    # probes fall outside the 2-tile window and run through the residual
    # pass (or, past RES_CAP, the whole-segment generic rerun). Either way
    # results must be exact.
    rng = np.random.default_rng(13)
    index = _rand_index(rng, 40, 3_000_000, zero_frac=0.2)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(16384, 31))
    qcounts = rng.integers(1, 2000, 16384).astype(np.int32)
    _compare(index, keys, qcounts, monkeypatch)


def test_stream_dev_exact_qc_in_key(monkeypatch):
    """search_keys_dev with a max_freq bound (sort key carries the clipped
    frequency, dropping one payload array) must match both the unpacked
    dev dispatch and the host path bit-for-bit — including overflow
    frequencies in (FREQ_CAP, 2^QKEY_BITS)."""
    import jax

    from colorid_tpu.engine import pack_keys_host
    from colorid_tpu.ops.stream_query import PC

    rng = np.random.default_rng(23)
    index = _rand_index(rng, 21, 100_000)
    monkeypatch.setenv("COLORID_STREAM", "force")
    eng = QueryEngine(index)
    assert eng._stream
    n = 20000
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(n, 31))
    qcounts = rng.integers(1, 2000, n).astype(np.int32)
    packed = pack_keys_host(keys)
    P = ((n + PC - 1) // PC) * PC
    pk = np.zeros((P, 2), np.uint32)
    pk[:n] = packed
    qc = np.zeros(P, np.int32)
    qc[:n] = np.maximum(qcounts, 1)
    pk_dev = jax.device_put(pk)
    qc_dev = jax.device_put(qc)
    a = eng.search_keys_dev(pk_dev, qc_dev, k=31)
    b = eng.search_keys_dev(pk_dev, qc_dev, k=31, max_freq=int(qc.max()))
    assert a is not None and b is not None
    np.testing.assert_array_equal(b.counts, a.counts)
    np.testing.assert_array_equal(b.and_all, a.and_all)
    assert b.freq_stats() == a.freq_stats()
    host = eng.search_keys(keys, qcounts=qcounts)
    np.testing.assert_array_equal(b.counts, host.counts)
    assert b.freq_stats() == host.freq_stats()


def test_stream_auto_gate(monkeypatch):
    rng = np.random.default_rng(17)
    index = _rand_index(rng, 10, 50_000)
    # default ON for eligible blocked-v2 indexes; =0 disables
    monkeypatch.delenv("COLORID_STREAM", raising=False)
    assert QueryEngine(index)._stream
    monkeypatch.setenv("COLORID_STREAM", "0")
    assert not QueryEngine(index)._stream
    monkeypatch.setenv("COLORID_STREAM", "1")
    eng = QueryEngine(index)
    n_blocks = index.bloom_size // eng.rpb
    assert eng._use_stream(4 * n_blocks)
    assert not eng._use_stream(n_blocks)
    # classic (non-blocked) and v1 indexes never stream
    idx1 = BigsiIndex(
        index.bloom_size, 4, 31, 0, index.colors, index.n_ref_kmers,
        index.matrix, blocked=1,
    )
    assert not QueryEngine(idx1)._stream
