"""Index build + device query engine, cross-checked against an independent
pure-numpy/xxhash oracle over the bundled 4-phage reference genomes."""

import numpy as np
import pytest

xxhash = pytest.importorskip("xxhash")

from colorid_tpu.core.dna import to_bytes, to_str
from colorid_tpu.core.kmers import canonical_windows, unique_rows
from colorid_tpu.engine import QueryEngine
from colorid_tpu.index.bigsi import BigsiIndex, read_bxi, write_bxi
from colorid_tpu.pipelines.build import build_index, tab_to_map
from tests import oracle

REFS = "/root/reference/test_data/refs"
BLOOM = 200_000
K = 27
H = 4


@pytest.fixture(scope="module")
def phage_index(tmp_path_factory):
    ref_map = {
        "Listeria_phage_B021": [f"{REFS}/Listeria_phage_B021.fasta"],
        "Listeria_phage_B056": [f"{REFS}/Listeria_phage_B056.fasta"],
        "Listeria_phage_B545": [f"{REFS}/Listeria_phage_B545.fasta"],
    }
    return build_index(ref_map, BLOOM, H, K, verbose=False), ref_map


def _oracle_bloom(kmers, bloom, h):
    rows = set()
    per_kmer = {}
    for km in kmers:
        r = [xxhash.xxh3_64_intdigest(km.encode(), s) % bloom for s in range(h)]
        per_kmer[km] = r
        rows.update(r)
    return rows, per_kmer


def test_build_matches_oracle_bloom(phage_index):
    index, ref_map = phage_index
    from colorid_tpu.core.fastx import read_fasta

    for color, acc in enumerate(index.colors):
        seqs = read_fasta(ref_map[acc][0])
        want = oracle.kmerize_vector(seqs, K, 1, skip_n=True, uppercase=True)
        assert index.n_ref_kmers[acc] == len(want)
        rows, _ = _oracle_bloom(want.keys(), BLOOM, H)
        col_bits = (index.matrix[:, color // 32] >> np.uint32(color % 32)) & 1
        got_rows = set(np.nonzero(col_bits)[0].tolist())
        assert got_rows == rows


def test_engine_search_matches_oracle(phage_index):
    index, ref_map = phage_index
    engine = QueryEngine(index, chunk=4096)
    # query: one genome's k-mers + some random k-mers
    from colorid_tpu.core.fastx import read_fasta

    seqs = read_fasta(ref_map["Listeria_phage_B056"][0])
    w = canonical_windows(to_bytes(seqs[0][:20000]), K, skip_n=True, uppercase=True)
    keys, counts = unique_rows(w)
    rng = np.random.default_rng(0)
    rand = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(500, K))
    all_keys = np.concatenate([keys, rand])
    qcounts = np.concatenate(
        [counts, rng.integers(1, 3000, 500)]
    ).astype(np.int32)
    res = engine.search_keys(all_keys, qcounts=qcounts)

    # oracle: per-kmer row fetch + AND + per-color counting + uniq_freqs
    want_counts = np.zeros(index.n_colors, dtype=np.int64)
    uniq_freqs: dict[int, list[int]] = {}
    matrix = np.asarray(index.matrix)
    n_valid_all = True
    and_all = np.uint32(0xFFFFFFFF)
    for i, row_bytes in enumerate(all_keys):
        km = to_str(row_bytes)
        rows = [xxhash.xxh3_64_intdigest(km.encode(), s) % BLOOM for s in range(H)]
        words = [matrix[r, 0] for r in rows]
        if any(wd == 0 for wd in words):
            n_valid_all = False
            continue
        a = words[0]
        for wd in words[1:]:
            a &= wd
        and_all &= a
        hits = [c for c in range(index.n_colors) if (int(a) >> c) & 1]
        for c in hits:
            want_counts[c] += 1
        if len(hits) == 1:
            uniq_freqs.setdefault(hits[0], []).append(int(qcounts[i]))
    np.testing.assert_array_equal(res.counts, want_counts)
    assert res.all_valid == n_valid_all
    got_stats = res.freq_stats()
    assert set(got_stats) == set(uniq_freqs)
    from collections import Counter

    for c, freqs in uniq_freqs.items():
        mean, modus, nn = got_stats[c]
        assert nn == len(freqs)
        assert abs(mean - sum(freqs) / len(freqs)) < 1e-9
        occ = Counter(freqs)
        best = max(occ.values())
        assert modus == min(v for v, k in occ.items() if k == best)


def test_perfect_search_self_hit(phage_index):
    index, ref_map = phage_index
    from colorid_tpu.pipelines.search import perfect_search

    engine = QueryEngine(index)
    lines = perfect_search([ref_map["Listeria_phage_B056"][0]], engine)
    assert len(lines) >= 1
    hits = [l.split("\t")[1] for l in lines]
    assert "Listeria_phage_B056" in hits


def test_cxi_roundtrip(phage_index, tmp_path):
    index, _ = phage_index
    p = tmp_path / "x.bxi"
    index.save(str(p))
    loaded = BigsiIndex.load(str(p))
    assert loaded.colors == index.colors
    assert loaded.n_ref_kmers == index.n_ref_kmers
    np.testing.assert_array_equal(np.asarray(loaded.matrix), index.matrix)


def test_bincode_bxi_roundtrip(phage_index, tmp_path):
    index, _ = phage_index
    p = tmp_path / "ref_compat.bxi"
    write_bxi(index, str(p))
    loaded = read_bxi(str(p))
    assert loaded.colors == index.colors
    assert loaded.bloom_size == index.bloom_size
    assert loaded.n_ref_kmers == index.n_ref_kmers
    np.testing.assert_array_equal(loaded.matrix, index.matrix)
    # autodetection through BigsiIndex.load
    auto = BigsiIndex.load(str(p))
    np.testing.assert_array_equal(auto.matrix, index.matrix)


def test_search_keys_dev_generic_matches_host_path(phage_index):
    """Device-resident exact-mode generic query (the classic-layout
    steady-state bench path, engine.search_keys_dev_generic_async) must
    reproduce search_keys bit-for-bit: counts, and_all, freq stats."""
    import jax.numpy as jnp

    from colorid_tpu import native
    from colorid_tpu.core.fastx import read_fasta

    index, ref_map = phage_index
    engine = QueryEngine(index, chunk=4096)
    g = "".join(read_fasta(list(ref_map.values())[0][0])).upper()
    L = 2000
    n_r = min(16, len(g) // L)
    reads = np.frombuffer(g[: n_r * L].encode(), np.uint8).reshape(n_r, L)
    nc = native.NativeCounter(K)
    assert nc.add_many(np.ascontiguousarray(reads))
    packed, qcounts = nc.dump_packed(0)
    n = packed.shape[0]
    chunk = min(engine.chunk, 1 << 20)
    P = ((n + chunk - 1) // chunk) * chunk
    pk = np.zeros((P, 2), np.uint32)
    pk[:n] = packed
    qc = np.zeros(P, np.int32)
    qc[:n] = np.maximum(qcounts, 1)
    vec, oc, of, capO = engine.search_keys_dev_generic_async(
        jnp.asarray(pk), jnp.asarray(qc), k=K
    )
    res = engine.search_keys_dev_finish(np.asarray(vec), oc, of, capO)
    ref = engine.search_keys(
        None, qcounts=np.maximum(qcounts, 1).astype(np.int32),
        packed_all=packed, k=K,
    )
    assert res is not None
    assert (res.counts == ref.counts).all()
    assert res.all_valid == ref.all_valid
    assert (res.and_all == ref.and_all).all()
    assert res.freq_stats() == ref.freq_stats()
