"""info subcommand: dump index parameters + per-accession FP stats
(main.rs:630-703)."""

from __future__ import annotations

from ..core.stats import false_prob
from ..index.bigsi import BigsiIndex


def info_lines(index: BigsiIndex) -> list[str]:
    lines = []
    if index.m_size:
        lines.append(
            "BIGSI parameters:\n"
            f"Bloomfilter-size: {index.bloom_size}\n"
            f"Number of hashes: {index.num_hash}\n"
            f"K-mer size: {index.k_size}\n"
            f" minimizer size: {index.m_size}\n"
        )
    else:
        lines.append(
            "BIGSI parameters:\n"
            f"Bloomfilter-size: {index.bloom_size}\n"
            f"Number of hashes: {index.num_hash}\n"
            f"K-mer size: {index.k_size}"
        )
    lines.append(f"Number of accessions in index: {index.n_colors}")
    for a in sorted(index.colors):
        n = index.n_ref_kmers.get(a, 0)
        fp = false_prob(float(index.bloom_size), float(index.num_hash), float(n))
        lines.append(f"{a} {n} {fp:.3f}")
    return lines
