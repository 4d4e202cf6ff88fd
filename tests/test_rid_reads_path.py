"""Device-extraction read_id path (COLORID_RID_READS) byte-parity.

The reads path ships 2-bit packed mates + a per-window rank plane and
re-derives all k-mer windows on device (ops/query.py::
query_readid_reads_batch); its _reads.txt/_counts.txt must be
byte-identical to the per-k-mer packed path on both index layouts,
including N-masked bases, junk reads, too-short reads, and stride d > 1.
"""

import gzip
import os

import numpy as np
import pytest

from colorid_tpu import native
from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.engine import QueryEngine
from colorid_tpu.pipelines.build import build_index
from colorid_tpu.pipelines.read_id import read_id

REFS = "/root/reference/test_data/refs"


@pytest.fixture(scope="module")
def fqs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ridreads")
    refs = {
        f[:-6]: [os.path.join(REFS, f)]
        for f in sorted(os.listdir(REFS))
        if f.endswith(".fasta")
    }
    rng = np.random.default_rng(5)
    gs = ["".join(read_fasta(p[0])).upper() for p in refs.values()]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    fq1, fq2 = str(tmp / "r1.fq.gz"), str(tmp / "r2.fq.gz")
    with gzip.open(fq1, "wt") as f1, gzip.open(fq2, "wt") as f2:
        for i in range(800):
            g = gs[int(rng.integers(0, len(gs)))]
            s = int(rng.integers(0, len(g) - 500))
            r1 = list(g[s : s + 150])
            if i % 11 == 0:
                r1 = ["ACGT"[c] for c in rng.integers(0, 4, 150)]
            q1 = ["I"] * 150
            if i % 7 == 0:
                for p in rng.integers(0, 150, 5):
                    q1[int(p)] = "#"  # below Q15 -> masked to N
            r2 = g[s + 350 : s + 500].encode().translate(comp)[::-1].decode()
            if i % 13 == 0:
                r1 = list("ACGTACGTACG")  # too_short (< k)
            f1.write(f"@r{i}\n{''.join(r1)}\n+\n{''.join(q1[:len(r1)])}\n")
            f2.write(f"@r{i}\n{r2}\n+\n{'I' * 150}\n")
    return refs, fq1, fq2, tmp


@pytest.mark.skipif(not native.available(), reason="native lib required")
@pytest.mark.parametrize("blocked", [False, True])
@pytest.mark.parametrize("d", [1, 3])
def test_reads_path_byte_parity(fqs, blocked, d):
    refs, fq1, fq2, tmp = fqs
    index = build_index(refs, 750_000, 4, 27, verbose=False, blocked=blocked)
    engine = QueryEngine(index)
    outs = {}
    for env in ("0", "1"):
        os.environ["COLORID_RID_READS"] = env
        try:
            pfx = str(tmp / f"v{env}_b{int(blocked)}_d{d}")
            read_id([fq1, fq2], engine, prefix=pfx, d=d)
        finally:
            del os.environ["COLORID_RID_READS"]
        outs[env] = (
            open(pfx + "_reads.txt").read(),
            open(pfx + "_counts.txt").read(),
        )
    assert outs["0"][0] == outs["1"][0]
    assert outs["0"][1] == outs["1"][1]


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_rank_windows_contract():
    """ct_read_rank_windows marks exactly the first-occurrence windows with
    the fnv rank and everything else -1; maplen = set size."""
    from colorid_tpu.core.kmers import kmer_set
    from colorid_tpu.pipelines.read_id import _fnv_order_keys

    rng = np.random.default_rng(3)
    read = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=90)
    k = 27
    offs = np.array([0, 90], dtype=np.int64)
    got = native.read_rank_windows(
        read, offs, np.array([1], dtype=np.int32), k, 1, 90 - k + 1
    )
    assert got is not None
    ranks, maplen = got
    keys = kmer_set([read], k)
    assert maplen[0] == keys.shape[0]
    emitted = ranks[0][ranks[0] >= 0]
    assert sorted(emitted.tolist()) == list(range(maplen[0]))
    # rank agrees with the python fnv-order emulation: the key at window w
    # (first occurrence) must sit at position ranks[0][w] of the fnv order
    ordered = _fnv_order_keys(keys)
    from colorid_tpu.core.kmers import canonical_windows

    wins = canonical_windows(read, k, skip_n=True, uppercase=True)
    seen = set()
    for w in range(wins.shape[0]):
        key = wins[w].tobytes()
        if key in seen:
            assert ranks[0][w] == -1
            continue
        seen.add(key)
        r = int(ranks[0][w])
        assert r >= 0
        assert ordered[r].tobytes() == key


def test_gather_tie_prep_mixed_rank_dtypes():
    """Mixed per-group rank-plane dtypes (uint8 with 255 = none vs int16
    with -1 = none) must normalize to int16/-1 before concatenation: a raw
    concat would promote uint8 255 markers into live rank-255 entries."""
    from colorid_tpu.pipelines.read_id import _gather_tie_prep

    W, NW = 10, 4
    # group 0: one read, one mate, uint8 ranks (255 marks no-rank)
    g0 = (
        np.arange(W, dtype=np.uint32).reshape(1, W),
        np.array([0], dtype=np.int32),
        np.array([150], dtype=np.int32),
        np.array([[3, 255, 0, 255]], dtype=np.uint8),
        None,
        150,
    )
    # group 1: one read, one mate, int16 ranks (-1 marks no-rank)
    g1 = (
        np.arange(W, 2 * W, dtype=np.uint32).reshape(1, W),
        np.array([0], dtype=np.int32),
        np.array([150], dtype=np.int32),
        np.array([[-1, 7, 260, -1]], dtype=np.int16),
        None,
        150,
    )
    pr = _gather_tie_prep([0, 1], [g0, g1], [0, 1], 1)
    assert pr is not None
    mates, seg, lens, ranks, _maplen, Lb = pr
    assert ranks.dtype == np.int16
    assert ranks.tolist() == [[3, -1, 0, -1], [-1, 7, 260, -1]]
    assert seg.tolist() == [0, 1]
    assert Lb == 150


@pytest.mark.skipif(not native.available(), reason="native lib required")
@pytest.mark.parametrize("blocked", [False, True])
def test_orderfree_safe_path_byte_parity(fqs, tmp_path, blocked):
    """COLORID_RID_SAFE=1 (order-free pass + selective exact replay) must be
    byte-identical to the always-replay path on an adversarial mix that
    drives every unsafe branch: junk reads (absent k-mers -> break),
    chimeric reads (all k-mers present but the top color misses many ->
    the pigeonhole test fails), and clean reads (provably safe)."""
    import gzip

    refs, _fq1, _fq2, _tmp = fqs
    rng = np.random.default_rng(17)
    gs = ["".join(read_fasta(p[0])).upper() for p in refs.values()]
    fq1 = str(tmp_path / "c1.fq.gz")
    fq2 = str(tmp_path / "c2.fq.gz")
    with gzip.open(fq1, "wt") as f1, gzip.open(fq2, "wt") as f2:
        for i in range(600):
            ga = gs[int(rng.integers(0, len(gs)))]
            gb = gs[int(rng.integers(0, len(gs)))]
            s1 = int(rng.integers(0, len(ga) - 160))
            s2 = int(rng.integers(0, len(gb) - 160))
            if i % 3 == 0:  # chimera: half from each genome
                r1 = ga[s1 : s1 + 75] + gb[s2 : s2 + 75]
            elif i % 7 == 0:  # junk
                r1 = "".join("ACGT"[c] for c in rng.integers(0, 4, 150))
            else:
                r1 = ga[s1 : s1 + 150]
            r2 = gb[s2 : s2 + 150]
            f1.write(f"@r{i}\n{r1}\n+\n{'I' * len(r1)}\n")
            f2.write(f"@r{i}\n{r2}\n+\n{'I' * len(r2)}\n")
    index = build_index(refs, 750_000, 4, 27, verbose=False, blocked=blocked)
    engine = QueryEngine(index)
    outs = {}
    for env in ("0", "1"):
        os.environ["COLORID_RID_SAFE"] = env
        try:
            pfx = str(tmp_path / f"safe{env}_b{int(blocked)}")
            read_id([fq1, fq2], engine, prefix=pfx)
        finally:
            del os.environ["COLORID_RID_SAFE"]
        outs[env] = (
            open(pfx + "_reads.txt").read(),
            open(pfx + "_counts.txt").read(),
        )
    assert outs["0"][0] == outs["1"][0]
    assert outs["0"][1] == outs["1"][1]


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_orderfree_split_nontrivial(fqs):
    """The safety test must actually split: the adversarial mix in the
    module fixture holds both provably-safe reads and reads needing the
    exact replay (otherwise the parity test above proves nothing)."""
    from colorid_tpu.pipelines import read_id as rid

    refs, fq1, fq2, _tmp = fqs
    index = build_index(refs, 750_000, 4, 27, verbose=False)
    engine = QueryEngine(index)
    calls = {"n": 0, "reads": 0}
    orig = rid._prepare_reads

    def spy(batch, idx, k, d, fnv):
        calls["n"] += 1
        calls["reads"] += len(idx)
        return orig(batch, idx, k, d, fnv)

    rid._prepare_reads = spy
    try:
        import gzip

        batch = []
        with gzip.open(fq1, "rt") as f1, gzip.open(fq2, "rt") as f2:
            l1, l2 = f1.readlines(), f2.readlines()
        for j in range(0, len(l1), 4):
            batch.append(
                (
                    l1[j].split()[0],
                    [
                        np.frombuffer(l1[j + 1].strip().encode(), np.uint8),
                        np.frombuffer(l2[j + 1].strip().encode(), np.uint8),
                    ],
                )
            )
        rows = rid.classify_batch(batch, engine, 1, 1e-3, 3)
    finally:
        rid._prepare_reads = orig
    assert all(r is not None for r in rows)
    # some reads replayed exactly...
    assert calls["reads"] > 0
    # ...but far from all of them (the safe majority skipped the replay)
    assert calls["reads"] < len(batch) // 2
