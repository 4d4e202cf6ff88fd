"""Blocked-v3 (value-addressed) layout + fused reads pipeline.

The v3 placement must agree between the host builder (ops/blocked.py) and
the device query (ops/hash_jax.py), be monotone in the k-mer value, and the
one-call fused pipeline (ops/fused_reads.py) must reproduce the generic
extract->count->query path bit-exactly on the same index.
"""

import os

import numpy as np
import pytest

from colorid_tpu.ops.blocked import (
    blocked_rows_host,
    pack_keys_u64,
    v3_supported,
)

REFS = "/root/reference/test_data/refs"
ACGT_B = np.frombuffer(b"ACGT", dtype=np.uint8)


def _keys(n, k, seed=0):
    rng = np.random.default_rng(seed)
    return rng.choice(ACGT_B, size=(n, k))


@pytest.mark.parametrize(
    "k,H,bloom",
    [(31, 4, 50_000_000), (21, 2, 30_000_128), (15, 1, 1_000_064),
     (32, 4, 12_800), (4, 4, 6400)],
)
@pytest.mark.parametrize("ver", [3, 4])
def test_v3_host_device_match(k, H, bloom, ver):
    import jax.numpy as jnp

    from colorid_tpu.ops.hash_jax import pack_keys_host
    from colorid_tpu.ops.query import _device_rows

    assert v3_supported(1, H, k)
    keys = _keys(500, k)
    rows_h = blocked_rows_host(keys, H, bloom, 128, version=ver)
    pk = pack_keys_host(keys)
    rows_d = np.asarray(
        _device_rows(jnp.asarray(pk[:, 0]), jnp.asarray(pk[:, 1]), k, H,
                     bloom, 128, ver)
    )
    assert (rows_h == rows_d).all()


@pytest.mark.parametrize("ver", [3, 4])
def test_v3_block_monotone_and_split_lane(ver):
    k, H, bloom, rpb = 31, 4, 50_000_000, 128
    keys = _keys(5000, k, seed=1)
    rows = blocked_rows_host(keys, H, bloom, rpb, version=ver)
    vals = pack_keys_u64(keys)
    order = np.argsort(vals, kind="stable")
    blk = rows[:, 0] // rpb
    assert (np.diff(blk[order]) >= 0).all()  # monotone in value
    grp = rpb // H
    for h in range(H):
        off = rows[:, h] % rpb
        assert ((off >= h * grp) & (off < (h + 1) * grp)).all()


def test_v4_block_load_balance():
    """CANONICAL k-mer values pile up low in the keyspace (density ~2(1-x));
    the v4 CDF-corrected map must spread them near-uniformly over blocks
    while v3's linear map shows the ~2x low-block overload + empty top."""
    from colorid_tpu.core.dna import COMP

    rng = np.random.default_rng(9)
    k, H, bloom, rpb = 31, 4, 1_280_000, 128
    fwd = ACGT_B[rng.integers(0, 4, (200_000, k))]
    rc = COMP[fwd[:, ::-1]]
    canon = np.where(
        (pack_keys_u64(fwd) <= pack_keys_u64(rc))[:, None], fwd, rc
    )
    nb = bloom // rpb
    decis = []
    for ver in (3, 4):
        rows = blocked_rows_host(canon, H, bloom, rpb, version=ver)
        blk = rows[:, 0] // rpb
        h = np.bincount(np.minimum(blk * 10 // nb, 9), minlength=10)
        decis.append(h / h.sum())
    v3d, v4d = decis
    assert v3d[0] > 1.6 * v3d[-1]  # v3: top decile starved
    assert v4d.max() < 1.15 * v4d.min()  # v4: near-uniform deciles


def _phage_refs():
    refs = {}
    for f in sorted(os.listdir(REFS)):
        if f.endswith(".fasta"):
            refs[f[:-6]] = [os.path.join(REFS, f)]
    return refs


@pytest.fixture(scope="module")
def v3_engine():
    from colorid_tpu.engine import QueryEngine
    from colorid_tpu.pipelines.build import build_index

    idx = build_index(_phage_refs(), 750_000, 4, 27, verbose=False,
                      blocked=True)
    assert idx.blocked == 4  # density-corrected value addressing (default)
    return QueryEngine(idx)


def _genome_reads(R=3000, L=120, seed=3):
    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.ops.extract import pack_reads

    rng = np.random.default_rng(seed)
    paths = [p[0] for p in _phage_refs().values()]
    g = "".join(read_fasta(paths[0])).upper() + "".join(
        read_fasta(paths[2])
    ).upper()
    starts = rng.integers(0, len(g) - L, R)
    reads = np.frombuffer(g.encode(), dtype=np.uint8)[
        starts[:, None] + np.arange(L)
    ]
    return pack_reads(reads), np.full(R, L, dtype=np.int32)


def test_fused_matches_generic(v3_engine):
    packed, lens = _genome_reads()
    res_f, n_f = v3_engine.search_reads(packed, lens, k=27, L=120, filter_t=1)
    v3_engine._stream = False
    try:
        res_g, n_g = v3_engine.search_reads(
            packed, lens, k=27, L=120, filter_t=1
        )
    finally:
        v3_engine._stream = True
    assert n_f == n_g
    assert (res_f.counts == res_g.counts).all()
    assert res_f.all_valid == res_g.all_valid
    assert (res_f.and_all == res_g.and_all).all()
    assert res_f.freq_stats() == res_g.freq_stats()


def test_fused_async_matches_sync(v3_engine):
    """search_reads_fused_async + search_reads_fused_finish (the bench's
    steady-state fused span) must reproduce the synchronous search_reads
    exactly, including n_unique and freq stats."""
    packed, lens = _genome_reads(seed=9)
    vec, oc, of, capO = v3_engine.search_reads_fused_async(
        packed, lens, k=27, L=120, filter_t=1
    )
    out = v3_engine.search_reads_fused_finish(np.asarray(vec), oc, of, capO)
    assert out is not None
    res_a, n_a = out
    res_s, n_s = v3_engine.search_reads(packed, lens, k=27, L=120, filter_t=1)
    assert n_a == n_s
    assert (res_a.counts == res_s.counts).all()
    assert res_a.all_valid == res_s.all_valid
    assert (res_a.and_all == res_s.and_all).all()
    assert res_a.freq_stats() == res_s.freq_stats()


@pytest.mark.parametrize("ft,R", [(3, 4000), (7, 12000)])
def test_fused_multi_round_compaction(v3_engine, ft, R):
    """filter_t=3 drives TWO pairwise-compaction rounds (4x slot reduction)
    in ops/fused_reads.py and filter_t=7 the capped THREE rounds (8x, the
    deepest halving plus its PC<<3 padding interaction); outputs must match
    the generic path exactly."""
    packed, lens = _genome_reads(R=R, L=120, seed=11)
    res_f, n_f = v3_engine.search_reads(packed, lens, k=27, L=120, filter_t=ft)
    v3_engine._stream = False
    try:
        res_g, n_g = v3_engine.search_reads(
            packed, lens, k=27, L=120, filter_t=ft
        )
    finally:
        v3_engine._stream = True
    assert n_f == n_g
    assert n_f > 0  # filter must leave survivors or the case proves nothing
    assert (res_f.counts == res_g.counts).all()
    assert res_f.all_valid == res_g.all_valid
    assert (res_f.and_all == res_g.and_all).all()
    assert res_f.freq_stats() == res_g.freq_stats()


def test_fused_stride_and_short_reads(v3_engine):
    packed, lens = _genome_reads(R=1200, L=120, seed=5)
    lens = lens.copy()
    lens[::3] = 60  # short reads: fewer valid windows
    res_f, n_f = v3_engine.search_reads(
        packed, lens, k=27, L=120, filter_t=0, d=3
    )
    v3_engine._stream = False
    try:
        res_g, n_g = v3_engine.search_reads(
            packed, lens, k=27, L=120, filter_t=0, d=3
        )
    finally:
        v3_engine._stream = True
    assert n_f == n_g
    assert (res_f.counts == res_g.counts).all()
    assert res_f.freq_stats() == res_g.freq_stats()


def test_v3_search_keys_stream_matches_generic(v3_engine):
    """search_keys (per-k-mer shipping) on a v3 index: the sorted-stream
    kernel path must agree with the generic gather."""
    from colorid_tpu.ops.hash_jax import pack_keys_host

    keys = _keys(200_000, 27, seed=7)
    pk = pack_keys_host(keys)
    qc = np.random.default_rng(8).integers(1, 300, keys.shape[0]).astype(
        np.int32
    )
    os.environ["COLORID_STREAM"] = "force"
    try:
        res_s = v3_engine.search_keys(None, qcounts=qc, packed_all=pk, k=27)
    finally:
        del os.environ["COLORID_STREAM"]
    v3_engine._stream = False
    try:
        res_g = v3_engine.search_keys(None, qcounts=qc, packed_all=pk, k=27)
    finally:
        v3_engine._stream = True
    assert (res_s.counts == res_g.counts).all()
    assert res_s.freq_stats() == res_g.freq_stats()


@pytest.mark.parametrize("ft", [0, 1])
def test_fused_chunked_matches_generic(v3_engine, monkeypatch, ft):
    """The chunked fused pipeline (per-chunk extract+compact, one global
    merge+filter+stream — the anti-wedge path for huge read sets) must be
    exact, including k-mers whose occurrences straddle chunk boundaries
    (the global strictly-greater filter cannot be applied per chunk)."""
    packed, lens = _genome_reads(R=6000, L=120, seed=21)
    # force chunking: 6000 reads x 94 windows -> ~564k windows; cap at 150k
    monkeypatch.setenv("COLORID_FUSED_MAX_WINDOWS", "150000")
    res_f, n_f = v3_engine.search_reads(packed, lens, k=27, L=120,
                                        filter_t=ft)
    monkeypatch.delenv("COLORID_FUSED_MAX_WINDOWS")
    v3_engine._stream = False
    try:
        res_g, n_g = v3_engine.search_reads(
            packed, lens, k=27, L=120, filter_t=ft
        )
    finally:
        v3_engine._stream = True
    assert n_f == n_g
    assert n_f > 0
    assert (res_f.counts == res_g.counts).all()
    assert res_f.all_valid == res_g.all_valid
    assert (res_f.and_all == res_g.and_all).all()
    assert res_f.freq_stats() == res_g.freq_stats()


def test_fused_chunked_cross_chunk_filter(v3_engine, monkeypatch):
    """A k-mer appearing ONCE in each of two chunks must survive
    filter_t=1 (global count 2 > 1) even though each per-chunk count is 1 —
    the failure mode of naive per-chunk filtering."""
    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.ops.extract import pack_reads

    paths = [p[0] for p in _phage_refs().values()]
    g = "".join(read_fasta(paths[0])).upper()
    L = 120
    uniqread = g[5000 : 5000 + L]  # same window set in both chunks
    rng = np.random.default_rng(31)
    reads = []
    for i in range(4000):
        if i == 10 or i == 3500:  # one copy in each chunk
            reads.append(uniqread)
        else:
            s = int(rng.integers(10_000, len(g) - L))
            reads.append(g[s : s + L])
    arr = np.frombuffer("".join(reads).encode(), np.uint8).reshape(-1, L)
    packed = pack_reads(arr)
    lens = np.full(arr.shape[0], L, dtype=np.int32)
    monkeypatch.setenv("COLORID_FUSED_MAX_WINDOWS", "200000")
    res_f, n_f = v3_engine.search_reads(packed, lens, k=27, L=L, filter_t=1)
    monkeypatch.delenv("COLORID_FUSED_MAX_WINDOWS")
    v3_engine._stream = False
    try:
        res_g, n_g = v3_engine.search_reads(packed, lens, k=27, L=L,
                                            filter_t=1)
    finally:
        v3_engine._stream = True
    assert n_f == n_g and n_f > 0
    assert (res_f.counts == res_g.counts).all()
    assert res_f.freq_stats() == res_g.freq_stats()
