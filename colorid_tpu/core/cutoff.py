"""Coverage auto-cutoff (Cortex-style), replicating kmer.rs:866-942 exactly.

Quirks preserved:
- ``coverages`` covers c = 1 .. max_cov-1 (max_cov itself excluded).
- first pseudo-derivative d1[j] = coverages[j+1] / coverages[j+2] (the Rust
  loop starts at i=1); float division by zero yields inf/nan, and nan
  comparisons are false — matching Rust f64 semantics.
- the "mean excluding singletons" uses the ENUMERATE INDEX as the coverage
  weight (bigsum += i * p over coverages[1..]), i.e. weight c-2, a reference
  quirk kept for parity.
- decision: d1-position if 0 < pos < 0.75*mean, else d2-position if > 0,
  else max(1, ceil(mean/2)).
- the reference panics when the histogram is too narrow (max_cov <= 3 gives
  an empty d1 and an out-of-bounds index) or the map is empty; we raise
  ValueError in those cases.
"""

from __future__ import annotations

import math

import numpy as np


def auto_cutoff(counts: np.ndarray) -> int:
    """Infer the frequency cutoff from k-mer counts (one entry per unique
    k-mer), mirroring kmer::auto_cutoff."""
    counts = np.asarray(counts)
    if counts.size == 0:
        raise ValueError("auto_cutoff on empty k-mer map (reference panics)")
    max_cov = int(counts.max())
    histo = np.bincount(counts.astype(np.int64), minlength=max_cov + 1)
    return auto_cutoff_hist(histo)


def auto_cutoff_hist(histo: np.ndarray) -> int:
    """auto_cutoff from a count histogram (histo[c] = number of unique
    k-mers seen exactly c times) — the device-resident counting path
    (ops/extract.py::count_histogram) feeds this without ever materializing
    per-k-mer counts host-side. Exact for counts below the histogram cap."""
    histo = np.asarray(histo, dtype=np.int64)
    nz = np.nonzero(histo[1:])[0]
    if nz.size == 0:
        raise ValueError("auto_cutoff on empty k-mer map (reference panics)")
    max_cov = int(nz[-1]) + 1
    n_uniq = int(histo.sum())
    total = int((np.arange(histo.size, dtype=np.int64) * histo).sum())
    total_mean = total / n_uniq
    if total_mean < 1.5:
        return 0
    coverages = histo[1:max_cov].astype(np.float64)  # c = 1 .. max_cov-1
    if coverages.size < 3:
        raise ValueError(
            "auto_cutoff: coverage histogram too narrow (reference panics)"
        )
    with np.errstate(divide="ignore", invalid="ignore"):
        d1 = coverages[1:-1] / coverages[2:]
        d2 = d1[:-1] / d1[1:]
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
    tail = coverages[1:]
    bigsum = float(np.sum(np.arange(tail.size) * tail))  # index-weight quirk
    num_kmers = float(tail.sum())
    mean = bigsum / num_kmers if num_kmers else float("nan")
    if first_pos_d1 > 0 and first_pos_d1 < mean * 0.75:
        return first_pos_d1
    if first_pos_d2 > 0:
        return first_pos_d2
    return max(1, math.ceil(mean / 2.0))


def clean_counts(
    keys: np.ndarray, counts: np.ndarray, t: int
) -> tuple[np.ndarray, np.ndarray]:
    """clean_map (kmer.rs:826-837): keep k-mers with count strictly > t."""
    keep = counts > t
    return keys[keep], counts[keep]
