"""Engine oracle test with 65 colors (3-word rows, wpad=4) — exercises the
multi-word block-gather, the device-hash path, and the rows fallback against
a per-k-mer python oracle."""

import numpy as np
import pytest

xxhash = pytest.importorskip("xxhash")

from colorid_tpu.core.dna import to_str
from colorid_tpu.engine import QueryEngine
from colorid_tpu.index.bigsi import BigsiIndex

BLOOM = 100_000
H = 4
K = 31
C = 65


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    matrix = rng.integers(0, 2**32, (BLOOM, 3), dtype=np.uint32)
    matrix[:, 2] &= 1  # 65th color only
    matrix[rng.integers(0, BLOOM, 30_000)] = 0  # absent rows
    names = [f"g{i:02d}" for i in range(C)]
    index = BigsiIndex(BLOOM, H, K, 0, names, {n: 1000 for n in names}, matrix)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(3000, K))
    qcounts = rng.integers(1, 3000, 3000).astype(np.int32)
    return index, matrix, keys, qcounts


def _oracle(index, matrix, keys, qcounts):
    counts = np.zeros(C, dtype=np.int64)
    uniq = {}
    all_valid = True
    and_all = np.full(3, 0xFFFFFFFF, dtype=np.uint32)
    for i, kb in enumerate(keys):
        km = to_str(kb)
        rows = [
            xxhash.xxh3_64_intdigest(km.encode(), s) % BLOOM for s in range(H)
        ]
        words = [matrix[r] for r in rows]
        if any(not w.any() for w in words):
            all_valid = False
            continue
        a = words[0].copy()
        for w in words[1:]:
            a &= w
        and_all &= a
        hits = [
            c for c in range(C) if (int(a[c // 32]) >> (c % 32)) & 1
        ]
        for c in hits:
            counts[c] += 1
        if len(hits) == 1:
            uniq.setdefault(hits[0], []).append(int(qcounts[i]))
    return counts, uniq, all_valid, and_all


def _check(res, counts, uniq, all_valid, and_all):
    from collections import Counter

    np.testing.assert_array_equal(res.counts, counts)
    assert res.all_valid == all_valid
    np.testing.assert_array_equal(res.and_all, and_all)
    stats = res.freq_stats()
    assert set(stats) == set(uniq)
    for c, freqs in uniq.items():
        mean, modus, n = stats[c]
        assert n == len(freqs)
        assert abs(mean - sum(freqs) / len(freqs)) < 1e-9
        occ = Counter(freqs)
        best = max(occ.values())
        assert modus == min(v for v, k in occ.items() if k == best)


def test_wide_device_hash_path(setup):
    index, matrix, keys, qcounts = setup
    engine = QueryEngine(index)
    res = engine.search_keys(keys, qcounts=qcounts)
    _check(res, *_oracle(index, matrix, keys, qcounts))


def test_wide_rows_path(setup):
    index, matrix, keys, qcounts = setup
    engine = QueryEngine(index)
    rows = engine.rows_for_keys(keys)
    res = engine.search_keys(None, qcounts=qcounts, rows_all=rows)
    _check(res, *_oracle(index, matrix, keys, qcounts))


def test_huge_frequencies_exact(setup):
    """Frequencies beyond uint16 must survive exactly via the index-resolved
    overflow path."""
    index, matrix, keys, _ = setup
    rng = np.random.default_rng(7)
    qcounts = rng.integers(1, 500_000, keys.shape[0]).astype(np.int32)
    engine = QueryEngine(index)
    res = engine.search_keys(keys, qcounts=qcounts)
    _check(res, *_oracle(index, matrix, keys, qcounts))


def test_4200_colors_wide_tier():
    """> 4096 colors on one device: rows span q = wpad//128 block-aligned
    blocks (the wide gather tier); checks device-hash and rows paths against
    a vectorized numpy oracle."""
    rng = np.random.default_rng(29)
    C3, bloom, H3, K3 = 4200, 3000, 3, 21
    W3 = (C3 + 31) // 32  # 132 words -> wpad 256
    matrix = rng.integers(0, 2**32, (bloom, W3), dtype=np.uint32)
    matrix[:, -1] &= (1 << (C3 - 32 * (W3 - 1))) - 1
    matrix[rng.integers(0, bloom, 600)] = 0  # absent rows
    names = [f"w{i:04d}" for i in range(C3)]
    index = BigsiIndex(bloom, H3, K3, 0, names, {n: 100 for n in names}, matrix)
    engine = QueryEngine(index)
    assert engine.wpad == 256
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(1200, K3))
    qcounts = rng.integers(1, 5000, 1200).astype(np.int32)

    rows = np.array(
        [
            [
                xxhash.xxh3_64_intdigest(to_str(kb).encode(), s) % bloom
                for s in range(H3)
            ]
            for kb in keys
        ]
    )
    words = matrix[rows]  # [N, H, W]
    valid = (words != 0).any(axis=2).all(axis=1)
    a = words[:, 0].copy()
    for h in range(1, H3):
        a &= words[:, h]
    bits = np.unpackbits(
        a.view(np.uint8), axis=1, bitorder="little"
    ).astype(np.int64)[:, :C3]
    vbits = bits * valid[:, None]
    counts = vbits.sum(axis=0)
    nhits = vbits.sum(axis=1)
    uniq = {}
    for i in np.nonzero(valid & (nhits == 1))[0]:
        uniq.setdefault(int(np.argmax(vbits[i])), []).append(int(qcounts[i]))
    and_all = np.full(W3, 0xFFFFFFFF, dtype=np.uint32)
    for i in np.nonzero(valid)[0]:
        and_all &= a[i]

    for res in (
        engine.search_keys(keys, qcounts=qcounts),
        engine.search_keys(
            None, qcounts=qcounts, rows_all=engine.rows_for_keys(keys)
        ),
    ):
        _check(res, counts, uniq, bool(valid.all()), and_all)


def test_200_colors_wpad8():
    """7-word rows (wpad=8): the widest packing tier below color-sharding."""
    rng = np.random.default_rng(13)
    C2, bloom = 200, 60_000
    matrix = rng.integers(0, 2**32, (bloom, 7), dtype=np.uint32)
    matrix[:, 6] &= (1 << 8) - 1  # colors 192..199
    matrix[rng.integers(0, bloom, 20_000)] = 0
    names = [f"x{i:03d}" for i in range(C2)]
    index = BigsiIndex(bloom, 3, 21, 0, names, {n: 500 for n in names}, matrix)
    engine = QueryEngine(index)
    assert engine.wpad == 8
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(1500, 21))
    qcounts = rng.integers(1, 100, 1500).astype(np.int32)
    res = engine.search_keys(keys, qcounts=qcounts)
    counts = np.zeros(C2, dtype=np.int64)
    uniq = {}
    for i, kb in enumerate(keys):
        km = to_str(kb)
        rows = [xxhash.xxh3_64_intdigest(km.encode(), s) % bloom for s in range(3)]
        words = [matrix[r] for r in rows]
        if any(not w.any() for w in words):
            continue
        a = words[0].copy()
        for w in words[1:]:
            a &= w
        hits = [c for c in range(C2) if (int(a[c // 32]) >> (c % 32)) & 1]
        for c in hits:
            counts[c] += 1
        if len(hits) == 1:
            uniq.setdefault(hits[0], []).append(int(qcounts[i]))
    np.testing.assert_array_equal(res.counts, counts)
    stats = res.freq_stats()
    assert set(stats) == set(uniq)
    for c, freqs in uniq.items():
        assert stats[c][2] == len(freqs)
