"""Blocked ("turbo") Bloom layout: all num_hash rows of a k-mer live in one
512-byte block of the packed matrix, so the query fetches ONE block per
k-mer instead of num_hash — the dominant device cost (the HBM block gather)
drops by num_hash x.

Placement (not bit-compatible with the reference's independent rows — this
is an opt-in format, `build --blocked`):

    rpb      = 128 // wpad                rows per 512B block (power of two)
    n_blocks = bloom_size // rpb          bloom_size padded to a multiple
    h_i      = xxh3_64(kmer, seed=i)
    block    = h_0 % n_blocks
    off_0    = (h_0 >> 32) % rpb          high bits: independent of block
    off_i    = h_i % rpb                  (i >= 1)
    row_i    = block * rpb + off_i

The false-positive rate matches a classic blocked Bloom filter: marginally
higher than independent rows at equal size (per-block load variance); the
reporting pipelines keep using the reference's false_prob formula as the
significance approximation.
"""

from __future__ import annotations

import numpy as np


def rows_per_block(wpad: int) -> int:
    return 128 // wpad


def pad_bloom_size(bloom_size: int) -> int:
    return ((bloom_size + 127) // 128) * 128


def v2_supported(wpad: int, num_hash: int) -> bool:
    """The split-lane (v2) placement needs a power-of-two hash count that
    divides the rows-per-block evenly (so each hash owns a lane group)."""
    rpb = rows_per_block(wpad)
    return (
        num_hash >= 1
        and (num_hash & (num_hash - 1)) == 0
        and num_hash <= rpb
    )


def _raw_hashes(keys: np.ndarray, num_hash: int) -> np.ndarray:
    from .. import native
    from ..hashing.xxh3 import xxh3_64_batch

    if keys.shape[0] and native.available():
        return native.xxh3_hash64(keys, num_hash)
    return np.stack(
        [xxh3_64_batch(keys, seed=i) for i in range(num_hash)], axis=1
    )


def blocked_rows_host(
    keys: np.ndarray,
    num_hash: int,
    bloom_size: int,
    rpb: int,
    version: int = 1,
) -> np.ndarray:
    """Row indices [N, H] for ASCII k-mer rows under the blocked layout.

    version 1: off_i = h_i % rpb (off_0 from the high hash bits).
    version 2 (split-lane): hash h's row confined to its own group of
    grp = rpb // H rows — off_h = h*grp + (h_h % grp) — so the query kernel
    can extract all H words with one fixed matrix contraction (a split-block
    Bloom filter; marginally different FP correlation than v1, same size).
    """
    n = keys.shape[0]
    h = _raw_hashes(keys, num_hash)
    nb = np.uint64(bloom_size // rpb)
    rpb64 = np.uint64(rpb)
    block = h[:, 0] % nb
    rows = np.empty((n, num_hash), dtype=np.int64)
    if version == 2:
        grp = np.uint64(rpb // num_hash)
        rows[:, 0] = (block * rpb64 + ((h[:, 0] >> np.uint64(32)) % grp)).astype(
            np.int64
        )
        for i in range(1, num_hash):
            rows[:, i] = (
                block * rpb64 + np.uint64(i) * grp + (h[:, i] % grp)
            ).astype(np.int64)
        return rows
    rows[:, 0] = (block * rpb64 + ((h[:, 0] >> np.uint64(32)) % rpb64)).astype(
        np.int64
    )
    for i in range(1, num_hash):
        rows[:, i] = (block * rpb64 + (h[:, i] % rpb64)).astype(np.int64)
    return rows
