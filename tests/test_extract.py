"""Device-side k-mer extraction/counting (ops/extract.py) vs the literal
kmer.rs oracle, and the fully device-resident search_reads path vs
search_keys."""

import numpy as np
import pytest

from colorid_tpu.engine import QueryEngine
from colorid_tpu.ops.extract import count_histogram, extract_count, pack_reads
from colorid_tpu.ops.hash_jax import pack_keys_host
from colorid_tpu.pipelines.build import build_index
from tests import oracle

REFS = "/root/reference/test_data/refs"


def _random_reads(rng, n, L, lmin=None):
    lens = (
        np.full(n, L, dtype=np.int32)
        if lmin is None
        else rng.integers(lmin, L + 1, n).astype(np.int32)
    )
    reads = rng.integers(0, 4, (n, L)).astype(np.uint8)
    reads = np.frombuffer(b"ACGT", dtype=np.uint8)[reads]
    for i, l in enumerate(lens):
        reads[i, l:] = ord("A")  # padding; masked by lens
    return reads, lens


def _truth(reads, lens, k, t, d=1):
    seqs = [bytes(reads[i, : lens[i]]).decode() for i in range(len(lens))]
    cnt = oracle.kmerize_vector(seqs, k, d=d)
    out = {}
    for km, c in cnt.items():
        if c > t:
            pk = pack_keys_host(np.frombuffer(km.encode(), np.uint8)[None, :])
            out[(int(pk[0, 0]), int(pk[0, 1]))] = c
    return out


@pytest.mark.parametrize("k,d,t", [(21, 1, 0), (31, 1, 1), (16, 1, 0), (21, 3, 0)])
def test_extract_count_matches_oracle(k, d, t):
    rng = np.random.default_rng(5)
    reads, lens = _random_reads(rng, 300, 60, lmin=10)  # incl. reads < k
    packed = pack_reads(reads)
    assert packed is not None
    pk, qc, n_u = extract_count(packed, lens, k=k, L=60, filter_t=t, d=d)
    pk, qc, n_u = np.asarray(pk), np.asarray(qc), int(n_u)
    want = _truth(reads, lens, k, t, d)
    assert n_u == len(want)
    got = {
        (int(pk[i, 0]), int(pk[i, 1])): int(qc[i]) for i in range(n_u)
    }
    assert got == want
    assert (qc[n_u:] == 0).all()  # padding marker for the query kernels


def test_extract_count_repeats():
    # reads with heavy repetition exercise run-length counting + overflowy
    # frequencies
    rng = np.random.default_rng(9)
    base = _random_reads(rng, 4, 40)[0]
    reads = np.repeat(base, 200, axis=0)
    lens = np.full(len(reads), 40, dtype=np.int32)
    pk, qc, n_u = extract_count(pack_reads(reads), lens, k=15, L=40, filter_t=0)
    want = _truth(reads, lens, 15, 0)
    got = {
        (int(pk[i, 0]), int(pk[i, 1])): int(qc[i]) for i in range(int(n_u))
    }
    assert got == want
    assert max(got.values()) >= 200


def test_count_histogram_matches_counts():
    rng = np.random.default_rng(3)
    reads, lens = _random_reads(rng, 200, 50, lmin=20)
    reads = np.concatenate([reads, reads[:50]])  # duplicate some
    lens = np.concatenate([lens, lens[:50]])
    hist = np.asarray(
        count_histogram(pack_reads(reads), lens, k=17, L=50, cap=64)
    )
    want = _truth(reads, lens, 17, 0)
    from collections import Counter

    wh = Counter(min(c, 63) for c in want.values())
    for c, n in wh.items():
        assert hist[c] == n
    assert hist.sum() == len(want)


def test_pack_reads_rejects_dirty():
    reads = np.frombuffer(b"ACGTNACGTACGTACG", dtype=np.uint8)[None, :]
    assert pack_reads(reads) is None
    reads = np.frombuffer(b"acgtacgtacgtacgt", dtype=np.uint8)[None, :]
    assert pack_reads(reads) is None


@pytest.fixture(scope="module")
def phage_engine():
    ref_map = {
        "Listeria_phage_B021": [f"{REFS}/Listeria_phage_B021.fasta"],
        "Listeria_phage_B056": [f"{REFS}/Listeria_phage_B056.fasta"],
        "Listeria_phage_B545": [f"{REFS}/Listeria_phage_B545.fasta"],
    }
    index = build_index(ref_map, 200_000, 4, 27, verbose=False)
    return QueryEngine(index, chunk=4096)


def _reads_from_genome(rng, n, L):
    from colorid_tpu.core.fastx import read_fasta

    g = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta")).upper()
    gb = np.frombuffer(g.encode(), dtype=np.uint8)
    starts = rng.integers(0, len(gb) - L, n)
    return gb[starts[:, None] + np.arange(L)]


@pytest.mark.parametrize("t", [0, 1])
def test_search_reads_matches_search_keys(phage_engine, t):
    engine = phage_engine
    rng = np.random.default_rng(11)
    reads = _reads_from_genome(rng, 500, 80)
    lens = np.full(500, 80, dtype=np.int32)
    res, n_u = engine.search_reads(
        pack_reads(reads), lens, k=27, L=80, filter_t=t
    )
    # reference path: host-side oracle counting -> search_keys
    want_map = _truth(reads, lens, 27, t)
    pk = np.zeros((len(want_map), 2), dtype=np.uint32)
    qc = np.zeros(len(want_map), dtype=np.int32)
    for i, ((lo, hi), c) in enumerate(sorted(want_map.items())):
        pk[i] = (lo, hi)
        qc[i] = c
    want = engine.search_keys(None, qcounts=qc, packed_all=pk, k=27)
    assert n_u == len(want_map)
    np.testing.assert_array_equal(res.counts, want.counts)
    np.testing.assert_array_equal(res.and_all, want.and_all)
    assert res.all_valid == want.all_valid
    np.testing.assert_array_equal(res.freq_hist, want.freq_hist)
    assert res.freq_stats() == want.freq_stats()


def test_search_reads_overflow_freqs(phage_engine):
    # one k-mer repeated >= FREQ_CAP times must land in the overflow list
    # with its EXACT frequency (device-resident counting has no host copy)
    engine = phage_engine
    rng = np.random.default_rng(13)
    one = _reads_from_genome(rng, 1, 27)
    reads = np.repeat(one, 1500, axis=0)
    lens = np.full(1500, 27, dtype=np.int32)
    res, n_u = engine.search_reads(
        pack_reads(reads), lens, k=27, L=27, filter_t=0
    )
    assert n_u == 1
    stats = res.freq_stats()
    assert any(abs(mean - 1500.0) < 1e-9 and n == 1 for mean, _, n in stats.values())


def test_pack_reads_masked_routes_dirty():
    from colorid_tpu.ops.extract import pack_reads_masked

    reads = np.frombuffer(b"ACGTACGTACGTACGT" * 3, dtype=np.uint8).reshape(3, 16).copy()
    reads[1, 5] = ord("N")
    words, clean = pack_reads_masked(reads)
    assert clean.tolist() == [True, False, True]
    # clean rows pack identically to pack_reads on the clean subset
    ref = pack_reads(reads[[0, 2]])
    np.testing.assert_array_equal(words[[0, 2]], ref)


def test_count_histogram_rejects_short():
    from colorid_tpu.ops.extract import count_histogram

    reads = np.frombuffer(b"ACGTACGTACGTACGT", dtype=np.uint8)[None].copy()
    lens = np.array([16], dtype=np.int32)
    with pytest.raises(ValueError):
        count_histogram(pack_reads(reads), jnp_arr(lens), k=20, L=16)


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
