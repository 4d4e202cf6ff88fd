"""Native C++ ingest vs the exact numpy/oracle implementations."""

import gzip

import numpy as np
import pytest

from colorid_tpu import native
from colorid_tpu.core.dna import to_bytes, to_str
from colorid_tpu.core.kmers import count_kmers, kmer_set
from colorid_tpu.hashing.xxh3 import bloom_rows_batch
from tests import oracle

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


def _rand_dna(rng, n, alphabet="ACGT"):
    return "".join(alphabet[c] for c in rng.integers(0, len(alphabet), n))


def test_counter_matches_numpy():
    rng = np.random.default_rng(0)
    for k in [5, 21, 27, 31, 32]:
        seqs = [_rand_dna(rng, int(rng.integers(10, 300)), "ACGTN") for _ in range(40)]
        for d in [1, 3]:
            want_k, want_c = count_kmers(
                (to_bytes(s) for s in seqs), k, d=d, skip_n=True, uppercase=True
            )
            nc = native.NativeCounter(k)
            for s in seqs:
                assert nc.add(to_bytes(s), d=d)
            keys, counts = nc.dump(0)
            order = np.lexsort(keys.T[::-1])
            got = {to_str(keys[i]): int(counts[i]) for i in order}
            want = {to_str(want_k[i]): int(want_c[i]) for i in range(len(want_c))}
            assert got == want, (k, d)


def test_counter_minimizer_matches_numpy():
    rng = np.random.default_rng(1)
    seqs = [_rand_dna(rng, int(rng.integers(40, 200))) for _ in range(20)]
    k, m = 27, 15
    want_k, want_c = count_kmers(
        (to_bytes(s) for s in seqs), k, skip_n=True, uppercase=True,
        minimizer=m, uppercase_minimizer=True,
    )
    nc = native.NativeCounter(k, m_size=m)
    for s in seqs:
        assert nc.add(to_bytes(s))
    keys, counts = nc.dump(0)
    got = {to_str(keys[i]): int(counts[i]) for i in range(len(counts))}
    want = {to_str(want_k[i]): int(want_c[i]) for i in range(len(want_c))}
    assert got == want


def test_counter_lowercase_fallback():
    nc = native.NativeCounter(5)
    assert not nc.add(to_bytes("ACGTacgtACGT"))
    assert nc.fallback


def test_count_fastq_pe(tmp_path):
    rng = np.random.default_rng(2)
    p1, p2 = tmp_path / "r1.fq.gz", tmp_path / "r2.fq.gz"
    recs = []
    for i in range(50):
        s1 = _rand_dna(rng, 80)
        s2 = _rand_dna(rng, 80)
        q1 = "".join(chr(int(c)) for c in rng.integers(35, 74, 80))
        q2 = "".join(chr(int(c)) for c in rng.integers(35, 74, 80))
        recs.append((s1, q1, s2, q2))
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for i, (s1, q1, s2, q2) in enumerate(recs):
            f1.write(f"@r{i}\n{s1}\n+\n{q1}\n")
            f2.write(f"@r{i}\n{s2}\n+\n{q2}\n")
    k, Q = 21, 15
    nc = native.count_fastq(str(p1), str(p2), k, Q)
    assert nc is not None
    keys, counts = nc.dump(0)
    got = {to_str(keys[i]): int(counts[i]) for i in range(len(counts))}
    masked = []
    for s1, q1, s2, q2 in recs:
        masked.append(oracle.qual_mask(s1, q1, Q))
        masked.append(oracle.qual_mask(s2, q2, Q))
    want = dict(oracle.kmerize_vector(masked, k, 1, skip_n=True, uppercase=False))
    assert got == want


def test_read_sets_matches_python():
    rng = np.random.default_rng(3)
    reads = []
    for i in range(30):
        n_m = int(rng.integers(1, 3))
        reads.append([_rand_dna(rng, int(rng.integers(25, 150)), "ACGTN") for _ in range(n_m)])
    k, d, H, bloom = 27, 2, 4, 100000
    concat = []
    offs = [0]
    nseqs = []
    for mates in reads:
        for s in mates:
            concat.append(to_bytes(s))
            offs.append(offs[-1] + len(s))
        nseqs.append(len(mates))
    out = native.read_sets(
        np.concatenate(concat) if concat else np.zeros(0, np.uint8),
        np.array(offs), np.array(nseqs), k, d, 0, H, bloom,
        fnv_order=False,  # first-occurrence pos; fnv ranks: test_fnv_order
    )
    assert out is not None
    rows, seg, pos, maplen = out
    # python reference
    ptr = 0
    for r, mates in enumerate(reads):
        keys = kmer_set([to_bytes(s) for s in mates], k, d=d)
        assert maplen[r] == keys.shape[0]
        if keys.shape[0]:
            want_rows = bloom_rows_batch(keys, H, bloom).astype(np.uint32)
            sel = seg == r
            np.testing.assert_array_equal(rows[sel], want_rows)
            np.testing.assert_array_equal(pos[sel], np.arange(keys.shape[0]))


def test_read_sets_minimizer():
    rng = np.random.default_rng(4)
    reads = [[_rand_dna(rng, 100)] for _ in range(10)]
    k, m, H, bloom = 27, 15, 3, 50000
    concat = np.concatenate([to_bytes(s[0]) for s in reads])
    offs = np.concatenate([[0], np.cumsum([len(s[0]) for s in reads])])
    out = native.read_sets(
        concat, offs, np.ones(len(reads), np.int32), k, 1, m, H, bloom
    )
    rows, seg, pos, maplen = out
    for r, mates in enumerate(reads):
        keys = kmer_set([to_bytes(mates[0])], k, d=1, minimizer=m)
        assert maplen[r] == keys.shape[0]
        want_rows = bloom_rows_batch(keys, H, bloom).astype(np.uint32)
        np.testing.assert_array_equal(rows[seg == r], want_rows)


def test_fastq_read_stream_matches_python(tmp_path):
    """The C++ read_id frontend must produce byte-identical classifications
    to the python streaming path."""
    import jax

    from colorid_tpu.engine import QueryEngine
    from colorid_tpu.pipelines.build import build_index
    from colorid_tpu.pipelines import read_id as R

    rng = np.random.default_rng(12)
    ref_map = {
        "B056": ["/root/reference/test_data/refs/Listeria_phage_B056.fasta"],
        "B021": ["/root/reference/test_data/refs/Listeria_phage_B021.fasta"],
    }
    index = build_index(ref_map, 120_000, 3, 21, verbose=False)
    engine = QueryEngine(index)
    from colorid_tpu.core.fastx import read_fasta

    g = "".join(read_fasta(ref_map["B056"][0]))
    p1, p2 = tmp_path / "a1.fq.gz", tmp_path / "a2.fq.gz"
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for i in range(500):
            s = int(rng.integers(0, len(g) - 300))
            q1 = "".join(chr(int(c)) for c in rng.integers(35, 74, 90))
            q2 = "".join(chr(int(c)) for c in rng.integers(35, 74, 90))
            f1.write(f"@q{i} x\n{g[s:s+90]}\n+\n{q1}\n")
            f2.write(f"@q{i} x\n{g[s+150:s+240]}\n+\n{q2}\n")
    native_out = str(tmp_path / "nat")
    R._run_stream_native(
        str(p1), str(p2), engine, 1, 1e-3, 3, 128, native_out,
        "read pairs", 15,
    )
    py_out = str(tmp_path / "py")
    reads = (
        (rid, [s1, s2], [qq1, qq2])
        for rid, s1, qq1, s2, qq2 in __import__(
            "colorid_tpu.core.fastx", fromlist=["x"]
        ).stream_fastq_pe_raw(str(p1), str(p2))
    )
    R._run_stream(
        reads, engine, 1, 1e-3, 3, 128, py_out, "read pairs", qual_offset=15
    )
    a = open(native_out + "_reads.txt").read()
    b = open(py_out + "_reads.txt").read()
    assert a == b and len(a.splitlines()) == 500
