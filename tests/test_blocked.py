"""Blocked ("turbo") index mode: placement oracle, engine parity with its
own spec, e2e build/search/read_id sanity."""

import numpy as np
import pytest

xxhash = pytest.importorskip("xxhash")

from colorid_tpu.cli import main
from colorid_tpu.core.dna import to_str
from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.engine import QueryEngine
from colorid_tpu.index.bigsi import BigsiIndex, write_bxi
from colorid_tpu.ops.blocked import blocked_rows_host, pad_bloom_size, rows_per_block
from colorid_tpu.pipelines.build import build_index
from tests.test_cli_e2e import REFS, _ref_manifest, _synth_fastq


def _oracle_rows(km: str, num_hash: int, bloom: int, rpb: int):
    h = [xxhash.xxh3_64_intdigest(km.encode(), s) for s in range(num_hash)]
    nb = bloom // rpb
    block = h[0] % nb
    rows = [block * rpb + ((h[0] >> 32) % rpb)]
    for i in range(1, num_hash):
        rows.append(block * rpb + (h[i] % rpb))
    return rows


def test_blocked_rows_host_matches_spec():
    rng = np.random.default_rng(0)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(300, 31))
    bloom, rpb = 128 * 1000, 128
    rows = blocked_rows_host(keys, 4, bloom, rpb)
    for i in range(0, 300, 37):
        assert rows[i].tolist() == _oracle_rows(to_str(keys[i]), 4, bloom, rpb)


def test_blocked_engine_matches_oracle():
    rng = np.random.default_rng(3)
    C, bloom = 21, pad_bloom_size(100_000)
    rpb = rows_per_block(1)  # wpad=1 -> 128 rows/block
    matrix = rng.integers(0, 2**21, (bloom, 1), dtype=np.uint32)
    matrix[rng.integers(0, bloom, 30_000)] = 0
    names = [f"c{i}" for i in range(C)]
    index = BigsiIndex(bloom, 4, 31, 0, names, {n: 1 for n in names}, matrix,
                       blocked=True)
    engine = QueryEngine(index)
    assert engine.rpb == rpb
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(2000, 31))
    qcounts = rng.integers(1, 3000, 2000).astype(np.int32)
    res = engine.search_keys(keys, qcounts=qcounts)
    # oracle
    counts = np.zeros(C, dtype=np.int64)
    uniq = {}
    for i, kb in enumerate(keys):
        rows = _oracle_rows(to_str(kb), 4, bloom, rpb)
        words = [int(matrix[r, 0]) for r in rows]
        if any(w == 0 for w in words):
            continue
        a = words[0]
        for w in words[1:]:
            a &= w
        hits = [c for c in range(C) if (a >> c) & 1]
        for c in hits:
            counts[c] += 1
        if len(hits) == 1:
            uniq.setdefault(hits[0], []).append(int(qcounts[i]))
    np.testing.assert_array_equal(res.counts, counts)
    stats = res.freq_stats()
    assert set(stats) == set(uniq)
    for c, freqs in uniq.items():
        assert stats[c][2] == len(freqs)
    # the rows path agrees with the packed path
    rows_all = engine.rows_for_keys(keys)
    res2 = engine.search_keys(None, qcounts=qcounts, rows_all=rows_all)
    np.testing.assert_array_equal(res2.counts, counts)


def test_blocked_e2e_cli(tmp_path, capsys):
    man = _ref_manifest(tmp_path)
    prefix = str(tmp_path / "turbo")
    main([
        "build", "-s", "750000", "-n", "4", "-k", "27", "--blocked",
        "-b", prefix, "-r", man,
    ])
    idx = BigsiIndex.load(prefix + ".bxi")
    assert idx.blocked and idx.bloom_size % 128 == 0
    fq = _synth_fastq(tmp_path)
    main(["search", "-b", prefix + ".bxi", "-q", fq, "-f", "1"])
    out = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    rows = {l.split("\t")[2]: l.split("\t") for l in out}
    assert float(rows["Listeria_phage_B056"][3]) > 0.9
    pre = str(tmp_path / "cls")
    main(["read_id", "-b", prefix + ".bxi", "-q", fq, "-n", pre, "-d", "10"])
    lines = [l.split("\t") for l in open(pre + "_reads.txt").read().splitlines()]
    acc = [r for r in lines if r[4] == "accept" and "B056" in r[1]]
    assert len(acc) >= 2000


def test_blocked_refuses_ref_format():
    idx = BigsiIndex(128, 2, 21, 0, ["a"], {"a": 1},
                     np.zeros((128, 1), np.uint32), blocked=True)
    with pytest.raises(ValueError):
        write_bxi(idx, "/tmp/should_not_exist.bxi")


def test_blocked_sharded_matches_single(tmp_path):
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from colorid_tpu.parallel import sharded
    from colorid_tpu.parallel.engine import ShardedQueryEngine

    ref_map = {
        f"B{n}": [f"{REFS}/Listeria_phage_B{n}.fasta"]
        for n in ["021", "051", "056", "545"]
    }
    index = build_index(ref_map, 200_000, 4, 27, verbose=False, blocked=True)
    g = read_fasta(f"{REFS}/Listeria_phage_B056.fasta")
    from colorid_tpu.core.dna import to_bytes
    from colorid_tpu.core.kmers import canonical_windows, unique_rows

    w = canonical_windows(
        to_bytes("".join(g)[:30000]), 27, skip_n=True, uppercase=True
    )
    keys, counts = unique_rows(w)
    qc = counts.astype(np.int32)
    want = QueryEngine(index).search_keys(keys, qcounts=qc)
    mesh = sharded.make_mesh(2, 2, "row")
    got = ShardedQueryEngine(index, mesh=mesh, layout="row", chunk=8192).search_keys(
        keys, qcounts=qc
    )
    np.testing.assert_array_equal(got.counts, want.counts)
    assert got.freq_stats() == want.freq_stats()
