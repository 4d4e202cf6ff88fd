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
