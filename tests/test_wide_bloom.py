"""bloom_size beyond int32 row addressing (>= 2^31).

The reference accepts any usize `-s` (src/main.rs:475-477; BigsyMapNew
usize fields, src/bigsi.rs:20-27). The engine's wide path splits each
int64 row into (block, lane) int32 pairs host-side
(ops/query.py::split_rows_wide) so a 3e9-bit classic index builds and
searches instead of raising. Cross-checked against a pure-numpy oracle
over the host matrix.
"""

import os

import numpy as np
import pytest

from colorid_tpu import native
from colorid_tpu.core.dna import UPPER
from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.engine import QueryEngine
from colorid_tpu.hashing.xxh3 import bloom_rows_batch
from colorid_tpu.pipelines.build import build_index

REFS = "/root/reference/test_data/refs"
K = 27
BLOOM = 3_000_000_000


@pytest.fixture(scope="module")
def wide_index():
    refs = {
        "B021": [os.path.join(REFS, "Listeria_phage_B021.fasta")],
        "B056": [os.path.join(REFS, "Listeria_phage_B056.fasta")],
    }
    return build_index(refs, BLOOM, 2, K, verbose=False), refs


def test_wide_build_and_search_matches_oracle(wide_index):
    index, refs = wide_index
    assert index.bloom_size == BLOOM
    assert index.matrix.shape[0] == BLOOM
    engine = QueryEngine(index, chunk=1 << 14)
    assert engine._wide

    g = "".join(read_fasta(refs["B056"][0]))
    gb = UPPER[np.frombuffer(g.encode(), dtype=np.uint8)]
    nc = native.NativeCounter(K)
    reads = gb[: 20 * 500].reshape(20, 500).copy()
    assert nc.add_many(np.ascontiguousarray(reads))
    keys, qcounts = nc.dump(0)
    qcounts = np.maximum(qcounts, 1).astype(np.int32)
    res = engine.search_keys(keys, qcounts=qcounts)

    # numpy oracle over the host matrix
    rows = bloom_rows_batch(keys, index.num_hash, BLOOM)
    vals = index.matrix[rows.reshape(-1), 0].reshape(rows.shape)
    andw = vals[:, 0]
    for h in range(1, index.num_hash):
        andw = andw & vals[:, h]
    present = (vals != 0).all(axis=1)
    C = index.n_colors
    bits = (andw[:, None] >> np.arange(C, dtype=np.uint32)) & 1
    exp_counts = (bits * present[:, None]).sum(axis=0)
    assert (res.counts == exp_counts).all()
    assert res.all_valid == bool(present.all())
    uniq = present & (bits.sum(axis=1) == 1)
    exp_uniq_per_color = [
        int((uniq & (bits[:, c] == 1)).sum()) for c in range(C)
    ]
    fs = res.freq_stats()
    for c in range(C):
        n = fs[c][2] if c in fs else 0
        assert n == exp_uniq_per_color[c]


def test_wide_read_id_rows_path(wide_index):
    """read_id on a wide-bloom index flows through the wide readid kernels
    (device-hash paths are gated off); sanity: reads from an indexed genome
    classify to their color."""
    from colorid_tpu.pipelines.read_id import classify_batch

    index, refs = wide_index
    engine = QueryEngine(index, chunk=1 << 14)
    g = "".join(read_fasta(refs["B056"][0])).upper()
    batch = []
    for i in range(8):
        s = 1000 + i * 700
        batch.append(
            (
                f"@r{i}",
                [np.frombuffer(g[s : s + 150].encode(), np.uint8)],
            )
        )
    rows = classify_batch(batch, engine, 1, 1e-3, 3)
    # every read resolves to B056 (alone, or tied with its close relative
    # B021 for reads from shared regions — a correct reject)
    assert all("B056" in r[1] for r in rows)
    assert sum(r[1] == "B056" and r[4] == "accept" for r in rows) >= len(rows) // 2


def test_wide_bloom_sharded_engine_raises(wide_index):
    """The sharded kernels address rows in int32; a wide bloom must raise
    a clear error instead of silently wrapping row indices."""
    from colorid_tpu.parallel.engine import ShardedQueryEngine

    index, _refs = wide_index
    with pytest.raises(ValueError, match="int32"):
        ShardedQueryEngine(index, layout="row")
