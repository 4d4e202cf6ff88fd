"""Wide-color sorted-stream kernel (wpad 8-32, up to 1024 colors).

VERDICT r3 #4: BASELINE config 5 (hundreds-of-colors metagenomic index,
k=21 n=2) must run the stream path instead of silently dropping to the
generic gather. The kernel's per-color epilogue works colors in groups of
128 lanes (ops/stream_query.py::_n_color_groups); these tests pin the
group loop bit-exact against the generic gather path on a 512-color
(wpad=16) and a 1024-color (wpad=32, num_hash 2) synthetic v4 index, for
both search_keys (per-k-mer shipping) and the fused reads pipeline.
"""

import os

import numpy as np
import pytest

from colorid_tpu.engine import QueryEngine
from colorid_tpu.index.bigsi import BigsiIndex
from colorid_tpu.ops.blocked import blocked_rows_host, rows_per_block

ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)
K = 31


def _build_wide_index(C, bloom, H, genomes, bver=4):
    """Scatter per-color canonical k-mer sets into a split-lane matrix the
    same way pipelines/build.py does (host path), at test scale."""
    from colorid_tpu.core.kmers import canonical_windows

    W = (C + 31) // 32
    wpad = 1 << (max(W, 1) - 1).bit_length()
    rpb = rows_per_block(wpad)
    matrix = np.zeros((bloom, W), dtype=np.uint32)
    n_ref = {}
    for c, g in enumerate(genomes):
        keys = np.unique(canonical_windows(g, K), axis=0)
        n_ref[f"g{c:04d}"] = keys.shape[0]
        rows = blocked_rows_host(keys, H, bloom, rpb, version=bver)
        np.bitwise_or.at(
            matrix[:, c // 32], rows.ravel(), np.uint32(1 << (c % 32))
        )
    return BigsiIndex(
        bloom, H, K, 0, [f"g{c:04d}" for c in range(C)], n_ref, matrix,
        blocked=bver,
    )


def _genomes(C, length, seed):
    rng = np.random.default_rng(seed)
    return [ACGT[rng.integers(0, 4, length)] for _ in range(C)]


def _query_batch(genomes, n, seed):
    """Canonical k-mers sampled from the genomes + some absent randoms."""
    from colorid_tpu.core.kmers import canonical_windows
    from colorid_tpu.ops.hash_jax import pack_keys_host

    rng = np.random.default_rng(seed)
    parts = []
    for gi in rng.integers(0, len(genomes), 12):
        w = canonical_windows(genomes[gi], K)
        parts.append(w[rng.integers(0, w.shape[0], n // 16)])
    parts.append(ACGT[rng.integers(0, 4, (n - sum(p.shape[0] for p in parts), K))])
    keys = np.concatenate(parts)
    _, idx = np.unique(keys, axis=0, return_index=True)
    keys = keys[np.sort(idx)]
    qc = rng.integers(1, 400, keys.shape[0]).astype(np.int32)
    return pack_keys_host(keys), qc


def _cmp(res_s, res_g):
    assert (res_s.counts == res_g.counts).all()
    assert res_s.all_valid == res_g.all_valid
    assert (res_s.and_all == res_g.and_all).all()
    assert res_s.freq_stats() == res_g.freq_stats()


@pytest.mark.parametrize("C,H,bloom", [(512, 2, 64_000), (1024, 2, 96_000)])
def test_wide_stream_search_keys_matches_generic(C, H, bloom):
    genomes = _genomes(C, 700, seed=C)
    index = _build_wide_index(C, bloom, H, genomes)
    engine = QueryEngine(index)
    assert engine._stream, "wide index must be stream-eligible"
    assert engine.wpad in (16, 32)
    pk, qc = _query_batch(genomes, 6000, seed=C + 1)
    os.environ["COLORID_STREAM"] = "force"
    try:
        res_s = engine.search_keys(None, qcounts=qc, packed_all=pk, k=K)
    finally:
        del os.environ["COLORID_STREAM"]
    engine._stream = False
    try:
        res_g = engine.search_keys(None, qcounts=qc, packed_all=pk, k=K)
    finally:
        engine._stream = True
    _cmp(res_s, res_g)


def test_wide_fused_reads_matches_generic():
    C, H, bloom = 512, 2, 64_000
    genomes = _genomes(C, 700, seed=77)
    index = _build_wide_index(C, bloom, H, genomes)
    engine = QueryEngine(index)
    assert engine._stream
    rng = np.random.default_rng(78)
    from colorid_tpu.ops.extract import pack_reads

    L, R = 120, 900
    reads = np.empty((R, L), dtype=np.uint8)
    for i in range(R):
        g = genomes[int(rng.integers(0, C))]
        s = int(rng.integers(0, len(g) - L))
        reads[i] = g[s : s + L]
    packed = pack_reads(reads)
    lens = np.full(R, L, dtype=np.int32)
    res_f, n_f = engine.search_reads(packed, lens, k=K, L=L, filter_t=0)
    engine._stream = False
    try:
        res_g, n_g = engine.search_reads(packed, lens, k=K, L=L, filter_t=0)
    finally:
        engine._stream = True
    assert n_f == n_g and n_f > 0
    _cmp(res_f, res_g)


def test_wide_num_hash4_grp_guard():
    """num_hash 4 at wpad 32 (rpb 4) would leave one candidate row per hash
    (degenerate Bloom); the build must fall back to the v1 blocked
    placement and the engine must not stream it."""
    from colorid_tpu.ops.blocked import v2_supported, v3_supported

    assert not v2_supported(32, 4)
    assert not v3_supported(32, 4, K)
    assert v2_supported(32, 2)
    assert v2_supported(16, 4)
