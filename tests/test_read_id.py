"""Read classifier vs an independent per-read oracle implementing
search_index(_classic) + kmer_poll_plus literally, iterating k-mer sets
and report maps in the emulated FnvHashSet/FnvHashMap order (core/fnv.py;
the production path computes ranks in C++ — cross-validated in
tests/test_fnv_order.py — so this exercises two implementations)."""

import math

import numpy as np
import pytest

xxhash = pytest.importorskip("xxhash")

from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.core.dna import to_bytes
from colorid_tpu.engine import QueryEngine
from colorid_tpu.pipelines.build import build_index
from colorid_tpu.pipelines.read_id import classify_batch
from tests import oracle

REFS = "/root/reference/test_data/refs"
BLOOM = 150_000
K = 21
H = 3


@pytest.fixture(scope="module")
def setup():
    ref_map = {
        "B021": [f"{REFS}/Listeria_phage_B021.fasta"],
        "B056": [f"{REFS}/Listeria_phage_B056.fasta"],
        "B545": [f"{REFS}/Listeria_phage_B545.fasta"],
    }
    index = build_index(ref_map, BLOOM, H, K, verbose=False)
    return index, QueryEngine(index)


def false_prob(m, k, n):
    return (1.0 - math.exp(-(k * (n + 0.5)) / (m - 1.0))) ** k


def binom_pmf(n, k, p):
    return math.comb(n, k) * (p**k) * ((1 - p) ** (n - k))


def oracle_classify(rid, seqs, index, d, fp_correct, B):
    from colorid_tpu.core.fnv import (
        fnv1a64_str,
        fnv_map_order_usize,
        hashbrown_iteration_order,
    )

    k, m = index.k_size, index.m_size
    C = index.n_colors
    matrix = np.asarray(index.matrix)
    if len(seqs[0]) < k:
        return (rid, "too_short", 0, 0, "accept", 0)
    # canonical k-mer set in emulated FnvHashSet iteration order
    kmers = []
    seen = set()
    for s in seqs:
        if len(s) < k:
            continue
        L = len(s)
        lr = oracle.revcomp(s)
        for i in range(0, L - k + 1, d):
            f = s[i : i + k]
            if not oracle.has_no_n(f):
                continue
            r = lr[L - (i + k) : L - i]
            w = f if f < r else r
            if m:
                w = oracle.find_minimizer(w, m).upper()
            if w not in seen:
                seen.add(w)
                kmers.append(w)
    order = hashbrown_iteration_order([fnv1a64_str(w.encode()) for w in kmers])
    kmers = [kmers[i] for i in order]
    report = {}
    no_hits = C
    cand = set()
    for pos, km in enumerate(kmers):
        rows = [
            xxhash.xxh3_64_intdigest(km.encode(), s) % index.bloom_size
            for s in range(index.num_hash)
        ]
        words = [matrix[r] for r in rows]
        if any(not w.any() for w in words):
            report[no_hits] = report.get(no_hits, 0) + 1
            break
        a = words[0].copy()
        for w in words[1:]:
            a &= w
        hits = [
            c for c in range(C) if (int(a[c // 32]) >> (c % 32)) & 1
        ]
        if B == 0 or pos < B:
            for c in hits:
                report[c] = report.get(c, 0) + 1
                if B > 0:
                    cand.add(c)
        else:
            for c in cand:
                if (int(a[c // 32]) >> (c % 32)) & 1:
                    report[c] = report.get(c, 0) + 1
    # kmer_poll_plus
    if not report:
        return (rid, "no_hits", 0, len(kmers), "accept", 0)
    if set(report) == {no_hits}:
        return (rid, "no_hits", 0, len(kmers), "accept", 0)
    n = len(kmers)
    sig = []
    # count_vec = report map iteration order, stable-sorted by count desc
    # (kmer_poll_plus, read_id_mt_pe.rs:195-196); dict preserves insertion
    # order, so emulate the FnvHashMap iteration permutation first
    iter_keys = fnv_map_order_usize(list(report))
    count_vec = sorted(
        ((c, report[c]) for c in iter_keys), key=lambda t: -t[1]
    )
    for c, cnt in count_vec:
        if c == no_hits:
            continue
        p = false_prob(index.bloom_size, index.num_hash, index.n_ref_kmers[index.colors[c]])
        crit = n * p
        mpf = binom_pmf(n, cnt, p)
        insig = (cnt < crit) or ((cnt > crit) and (mpf >= fp_correct))
        if not insig:
            sig.append((c, cnt))
    if not sig:
        return (rid, "no_significant_hits", 0, n, "reject", 0)
    top = sig[0][1]
    tops = [c for c, cnt in sig if cnt == top]
    if len(tops) == 1:
        return (rid, index.colors[tops[0]], top, n, "accept", 1)
    return (rid, ",".join(index.colors[c] for c in tops), top, n, "reject", len(tops))


def _mutate(rng, s, rate):
    out = list(s)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = "ACGTN"[rng.integers(0, 5)]
    return "".join(out)


@pytest.mark.parametrize("B", [0, 3])
@pytest.mark.parametrize("d", [1, 10])
def test_classifier_matches_oracle(setup, B, d):
    index, engine = setup
    rng = np.random.default_rng(42)
    genomes = {
        acc: read_fasta(f"{REFS}/Listeria_phage_{acc}.fasta")[0]
        for acc in ["B021", "B056", "B545"]
    }
    batch = []
    for i in range(60):
        acc = ["B021", "B056", "B545"][i % 3]
        g = genomes[acc]
        start = rng.integers(0, len(g) - 150)
        read = _mutate(rng, g[start : start + 150], rate=0.02)
        batch.append((f"@r{i}", [to_bytes(read)]))
    # some junk + short reads
    batch.append(("@short", [to_bytes("ACGT")]))
    batch.append(
        ("@junk", [to_bytes("".join("ACGT"[c] for c in rng.integers(0, 4, 150)))])
    )
    got = classify_batch(batch, engine, d=d, fp_correct=1e-3, start_sample=B)
    for rid, seqs in batch:
        pass
    want = [
        oracle_classify(rid, ["".join(chr(b) for b in s) for s in seqs], index, d, 1e-3, B)
        for rid, seqs in batch
    ]
    assert got == want


def test_classifier_pe_and_accuracy(setup):
    index, engine = setup
    rng = np.random.default_rng(7)
    g = read_fasta(f"{REFS}/Listeria_phage_B056.fasta")[0]
    batch = []
    for i in range(50):
        start = rng.integers(0, len(g) - 400)
        r1 = g[start : start + 150]
        r2 = oracle.revcomp(g[start + 250 : start + 400])
        batch.append((f"@p{i}", [to_bytes(r1), to_bytes(r2)]))
    got = classify_batch(batch, engine, d=1, fp_correct=1e-3, start_sample=3)
    accepted = [r for r in got if r[4] == "accept" and r[1] == "B056"]
    assert len(accepted) >= 45


def test_classifier_tie_order(setup):
    """Indexing the same genome under two accessions forces tied top hits on
    every matching read; the comma-joined reject names must follow the
    reference's FnvHashMap-order stable sort (kmer_poll_plus), which the
    oracle reproduces independently of the production fixup path."""
    ref_map = {
        "dupA": [f"{REFS}/Listeria_phage_B056.fasta"],
        "dupB": [f"{REFS}/Listeria_phage_B056.fasta"],
        "other": [f"{REFS}/Listeria_phage_B021.fasta"],
    }
    index = build_index(ref_map, BLOOM, H, K, verbose=False)
    engine = QueryEngine(index)
    rng = np.random.default_rng(5)
    g = read_fasta(f"{REFS}/Listeria_phage_B056.fasta")[0]
    batch = []
    for i in range(40):
        start = rng.integers(0, len(g) - 150)
        batch.append((f"@t{i}", [to_bytes(g[start : start + 150])]))
    for B in (0, 3):
        got = classify_batch(batch, engine, d=1, fp_correct=1e-3, start_sample=B)
        want = [
            oracle_classify(
                rid, ["".join(chr(b) for b in s) for s in seqs], index, 1,
                1e-3, B,
            )
            for rid, seqs in batch
        ]
        assert got == want
        rejects = [r for r in got if r[4] == "reject" and r[5] == 2]
        assert len(rejects) >= 30  # duplicates tie on nearly every read
        # the fnv map order puts dupB (color 1) before dupA (color 0) here —
        # a plain ascending-color join would get every one of these wrong
        assert any(r[1] != "dupA,dupB" for r in rejects)


def test_classifier_break_order(setup):
    """Reads with junk halves (absent k-mers) exercise the break cut point:
    the number of counted k-mers depends on the emulated set order, so a
    production/oracle match here validates the ordering end to end."""
    index, engine = setup
    rng = np.random.default_rng(9)
    g = read_fasta(f"{REFS}/Listeria_phage_B056.fasta")[0]
    batch = []
    for i in range(40):
        start = rng.integers(0, len(g) - 75)
        junk = "".join("ACGT"[c] for c in rng.integers(0, 4, 75))
        read = g[start : start + 75] + junk
        batch.append((f"@b{i}", [to_bytes(read)]))
    for B in (0, 3):
        got = classify_batch(batch, engine, d=1, fp_correct=1e-3, start_sample=B)
        want = [
            oracle_classify(
                rid, ["".join(chr(b) for b in s) for s in seqs], index, 1,
                1e-3, B,
            )
            for rid, seqs in batch
        ]
        assert got == want


def test_classifier_lowercase_mixed(setup):
    """Mixed-case reads must route through the exact path per read while the
    clean reads keep the fast path, with identical results to the oracle."""
    index, engine = setup
    rng = np.random.default_rng(11)
    g = read_fasta(f"{REFS}/Listeria_phage_B056.fasta")[3]
    batch = []
    for i in range(30):
        start = rng.integers(0, len(g) - 120)
        read = g[start : start + 120]
        if i % 3 == 0:
            read = read.lower()
        elif i % 3 == 1:
            read = read[:50] + read[50:70].lower() + read[70:]
        batch.append((f"@m{i}", [to_bytes(read)]))
    got = classify_batch(batch, engine, d=1, fp_correct=1e-3, start_sample=3)
    want = [
        oracle_classify(rid, ["".join(chr(b) for b in s) for s in seqs],
                        index, 1, 1e-3, 3)
        for rid, seqs in batch
    ]
    assert got == want
