"""Naive string-based oracle mirroring the reference Rust semantics
literally (slow; tests only). Implemented independently from the numpy
engine so the two can cross-check each other."""

from __future__ import annotations

import math
from collections import Counter

_COMP = {}
for a, b in [
    ("a", "t"), ("c", "g"), ("t", "a"), ("g", "c"), ("u", "a"), ("n", "n"),
    ("A", "T"), ("C", "G"), ("T", "A"), ("G", "C"), ("U", "A"), ("N", "N"),
]:
    _COMP[a] = b


def revcomp(s: str) -> str:
    return "".join(_COMP.get(c, "N") for c in reversed(s))


def has_no_n(s: str) -> bool:
    return all(c in "acgtACGT" for c in s)


def kmerize_vector(seqs, k, d=1, skip_n=True, uppercase=True) -> Counter:
    """kmer.rs:87-125 (and case variants via flags)."""
    out = Counter()
    for l in seqs:
        L = len(l)
        if L < k:
            continue
        lr = revcomp(l)
        for i in range(0, L - k + 1, d):
            f = l[i : i + k]
            r = lr[L - (i + k) : L - i]
            if skip_n and not has_no_n(f):
                continue
            win = f if f < r else r
            if uppercase:
                win = win.upper()
            out[win] += 1
    return out


def find_minimizer(seq: str, m: int) -> str:
    """kmer.rs:971-986 (rc offset for i=0 never examined)."""
    r = revcomp(seq)
    L = len(seq)
    minmer = seq[:m]
    for i in range(1, L - m + 1):
        f = seq[i : i + m]
        rc = r[L - (i + m) : L - i]
        if f < minmer:
            minmer = f
        if rc < minmer:
            minmer = rc
    return minmer


def minimerize_vector(seqs, k, m, d=1, uppercase_min=True) -> Counter:
    """minimerize_vector_skip_n (kmer.rs:328-361)."""
    out = Counter()
    for l in seqs:
        L = len(l)
        if L < k:
            continue
        lr = revcomp(l)
        for i in range(0, L - k + 1, d):
            f = l[i : i + k]
            r = lr[L - (i + k) : L - i]
            if not has_no_n(f):
                continue
            win = f if f < r else r
            mn = find_minimizer(win, m)
            if uppercase_min:
                mn = mn.upper()
            out[mn] += 1
    return out


def qual_mask(seq: str, qual: str, offset: int) -> str:
    if offset == 0:
        return seq
    cut = offset + 33
    return "".join(
        "N" if ord(q) < cut else seq[i] for i, q in enumerate(qual)
    )


def auto_cutoff(counter_values) -> int:
    """kmer.rs:866-942 literal transcription."""
    values = list(counter_values)
    max_cov = max(values)
    total_mean = sum(values) / len(values)
    if total_mean < 1.5:
        return 0
    histo = Counter(values)
    coverages = [histo.get(c, 0) for c in range(1, max_cov)]
    d1 = []
    for i in range(1, len(coverages) - 1):
        try:
            d1.append(coverages[i] / coverages[i + 1])
        except ZeroDivisionError:
            d1.append(
                float("nan") if coverages[i] == 0 else float("inf")
            )
    d2 = []
    for i in range(0, len(d1) - 1):
        try:
            d2.append(d1[i] / d1[i + 1])
        except ZeroDivisionError:
            d2.append(float("nan") if d1[i] == 0 else float("inf"))
    first_pos_d1 = 0
    for i, p in enumerate(d1):
        if p < 1.0:
            first_pos_d1 = i + 1
            break
    first_pos_d2 = 0
    for i, p in enumerate(d2):
        if p < 1.0:
            first_pos_d2 = i + 1
            break
    bigsum = sum(i * p for i, p in enumerate(coverages[1:]))
    num_kmers = sum(coverages[1:])
    mean = bigsum / num_kmers
    if first_pos_d1 > 0 and first_pos_d1 < mean * 0.75:
        return first_pos_d1
    elif first_pos_d2 > 0:
        return first_pos_d2
    else:
        return max(1, math.ceil(mean / 2.0))


def random_dna(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet)) for _ in range(n))
