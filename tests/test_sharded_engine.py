"""ShardedQueryEngine vs the single-device QueryEngine on the phage index."""

import jax
import numpy as np
import pytest

from colorid_tpu.core.dna import to_bytes
from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.core.kmers import canonical_windows, unique_rows
from colorid_tpu.engine import QueryEngine
from colorid_tpu.parallel.engine import ShardedQueryEngine
from colorid_tpu.pipelines.build import build_index

REFS = "/root/reference/test_data/refs"


@pytest.fixture(scope="module")
def setup():
    ref_map = {
        f"B{n}": [f"{REFS}/Listeria_phage_B{n}.fasta"]
        for n in ["021", "051", "056", "545"]
    }
    index = build_index(ref_map, 300_000, 4, 27, verbose=False)
    g = to_bytes("".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta")))
    w = canonical_windows(g, 27, skip_n=True, uppercase=True)
    keys, counts = unique_rows(w)
    rng = np.random.default_rng(0)
    rand = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(2000, 27))
    keys = np.concatenate([keys, rand])
    qcounts = np.concatenate(
        [counts, rng.integers(1, 2000, 2000)]
    ).astype(np.int32)
    want = QueryEngine(index).search_keys(keys, qcounts=qcounts)
    return index, keys, qcounts, want


@pytest.mark.parametrize("layout,nd,nm", [
    ("color", 2, 4), ("color", 1, 8), ("row", 2, 4), ("row", 1, 4),
])
def test_sharded_engine_matches(setup, layout, nd, nm):
    if len(jax.devices()) < nd * nm:
        pytest.skip("not enough devices")
    index, keys, qcounts, want = setup
    from colorid_tpu.parallel import sharded

    mesh = sharded.make_mesh(nd, nm, layout)
    eng = ShardedQueryEngine(index, mesh=mesh, layout=layout, chunk=8192)
    got = eng.search_keys(keys, qcounts=qcounts)
    np.testing.assert_array_equal(got.counts, want.counts)
    np.testing.assert_array_equal(got.and_all, want.and_all)
    assert got.all_valid == want.all_valid
    assert got.freq_stats() == want.freq_stats()


def _read_keysets(index, n_reads=37, junk_every=5):
    """Per-read k-mer key sets (fnv iteration order) incl. junk halves that
    trigger the break-on-absent path."""
    from colorid_tpu.core.kmers import kmer_set
    from colorid_tpu.pipelines.read_id import _fnv_order_keys

    rng = np.random.default_rng(12)
    g = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta"))
    out = []
    for i in range(n_reads):
        s = int(rng.integers(0, len(g) - 150))
        read = g[s : s + 150]
        if i % junk_every == 0:
            read = read[:75] + "".join(
                "ACGT"[c] for c in rng.integers(0, 4, 75)
            )
        keys = kmer_set([to_bytes(read)], index.k_size)
        out.append(_fnv_order_keys(keys))
    return out


@pytest.mark.parametrize("layout,nd,nm", [
    ("color", 2, 4), ("color", 4, 2), ("row", 2, 4),
])
@pytest.mark.parametrize("B", [0, 3])
def test_sharded_readid_matches(setup, layout, nd, nm, B):
    if len(jax.devices()) < nd * nm:
        pytest.skip("not enough devices")
    index, _keys, _qc, _want = setup
    from colorid_tpu.parallel import sharded

    keysets = _read_keysets(index)
    want = QueryEngine(index).readid_counts(keysets, B)
    mesh = sharded.make_mesh(nd, nm, layout)
    eng = ShardedQueryEngine(index, mesh=mesh, layout=layout)
    got = eng.readid_counts(keysets, B)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("layout,nd,nm", [
    ("color", 2, 4), ("color", 8, 1), ("row", 2, 4),
])
def test_sharded_search_reads_matches(setup, layout, nd, nm):
    """Device extraction + global unique merge on the mesh must reproduce
    the single-device search_reads exactly (counts, uniq-freq stats, n_u)."""
    if len(jax.devices()) < nd * nm:
        pytest.skip("not enough devices")
    index, _keys, _qc, _want = setup
    from colorid_tpu.ops.extract import pack_reads
    from colorid_tpu.parallel import sharded

    rng = np.random.default_rng(23)
    g = to_bytes(
        "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta")).upper()
    )
    L, k = 120, index.k_size
    starts = rng.integers(0, len(g) - L, 500)
    reads = g[starts[:, None] + np.arange(L)]
    packed = pack_reads(reads)
    lens = np.full(500, L, dtype=np.int32)
    want, want_n = QueryEngine(index).search_reads(
        packed, lens, k=k, L=L, filter_t=1
    )
    mesh = sharded.make_mesh(nd, nm, layout)
    eng = ShardedQueryEngine(index, mesh=mesh, layout=layout)
    got, got_n = eng.search_reads(packed, lens, k=k, L=L, filter_t=1)
    assert got_n == want_n
    np.testing.assert_array_equal(got.counts, want.counts)
    np.testing.assert_array_equal(got.and_all, want.and_all)
    assert got.all_valid == want.all_valid
    assert got.freq_stats() == want.freq_stats()


def test_sharded_blocked_fast_path(setup):
    """Blocked (turbo) indexes keep the single-fetch gather on meshes: the
    shard-local rows-per-block nests the build-time row group."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from colorid_tpu.parallel import sharded

    ref_map = {
        f"B{n}": [f"{REFS}/Listeria_phage_B{n}.fasta"]
        for n in ["021", "051", "056", "545"]
    }
    bindex = build_index(ref_map, 300_000, 4, 27, verbose=False, blocked=True)
    _index, keys, qcounts, _want = setup
    want = QueryEngine(bindex).search_keys(keys, qcounts=qcounts)
    keysets = _read_keysets(bindex)
    want_rid = QueryEngine(bindex).readid_counts(keysets, 3)
    for layout, nd, nm in [("color", 2, 4), ("row", 2, 4)]:
        mesh = sharded.make_mesh(nd, nm, layout)
        eng = ShardedQueryEngine(bindex, mesh=mesh, layout=layout, chunk=8192)
        assert eng.rpb > 0  # the fast path actually engaged
        got = eng.search_keys(keys, qcounts=qcounts)
        np.testing.assert_array_equal(got.counts, want.counts)
        assert got.freq_stats() == want.freq_stats()
        got_rid = eng.readid_counts(keysets, 3)
        np.testing.assert_array_equal(got_rid, want_rid)


@pytest.mark.parametrize("layout,nd,nm", [("color", 2, 4), ("row", 2, 4)])
def test_sharded_classify_batch_dropin(setup, layout, nd, nm):
    """ShardedQueryEngine is a drop-in for pipelines.read_id.classify_batch:
    the packed, arrays, and firsthit entry points all match QueryEngine,
    including tied-top reads (the firsthit tie-order fixup)."""
    if len(jax.devices()) < nd * nm:
        pytest.skip("not enough devices")
    index, _keys, _qc, _want = setup
    from colorid_tpu.parallel import sharded
    from colorid_tpu.pipelines.read_id import classify_batch

    rng = np.random.default_rng(77)
    g1 = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta"))
    g2 = "".join(read_fasta(f"{REFS}/Listeria_phage_B021.fasta"))
    batch = []
    for i in range(64):
        s = int(rng.integers(0, min(len(g1), len(g2)) - 150))
        if i % 7 == 3:
            read = "ACGT" * 5  # too_short
        elif i % 7 == 5:
            read = "".join("ACGT"[c] for c in rng.integers(0, 4, 150))
        else:
            read = (g1 if i % 2 else g2)[s : s + 150]
        batch.append((f"r{i}", [to_bytes(read)]))
    want = classify_batch(batch, QueryEngine(index), 1, 1e-3, 3)
    mesh = sharded.make_mesh(nd, nm, layout)
    eng = ShardedQueryEngine(index, mesh=mesh, layout=layout)
    got = classify_batch(batch, eng, 1, 1e-3, 3)
    assert got == want


@pytest.mark.parametrize("layout", ["color", "row"])
def test_sharded_readid_firsthit_matches(setup, layout):
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    index, _keys, _qc, _want = setup
    from colorid_tpu.parallel import sharded

    keysets = _read_keysets(index, n_reads=23)
    for B in (0, 3):
        want = QueryEngine(index).readid_firsthit(keysets, B)
        mesh = sharded.make_mesh(2, 4, layout)
        eng = ShardedQueryEngine(index, mesh=mesh, layout=layout)
        got = eng.readid_firsthit(keysets, B)
        np.testing.assert_array_equal(got, want)
