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


def blocked_rows_host(
    keys: np.ndarray, num_hash: int, bloom_size: int, rpb: int
) -> np.ndarray:
    """Row indices [N, H] for ASCII k-mer rows under the blocked layout."""
    from .. import native
    from ..hashing.xxh3 import xxh3_64_batch

    n = keys.shape[0]
    if n and native.available():
        h = native.xxh3_hash64(keys, num_hash)
    else:
        h = np.stack(
            [xxh3_64_batch(keys, seed=i) for i in range(num_hash)], axis=1
        )
    nb = np.uint64(bloom_size // rpb)
    rpb64 = np.uint64(rpb)
    block = h[:, 0] % nb
    rows = np.empty((n, num_hash), dtype=np.int64)
    rows[:, 0] = (block * rpb64 + ((h[:, 0] >> np.uint64(32)) % rpb64)).astype(
        np.int64
    )
    for i in range(1, num_hash):
        rows[:, i] = (block * rpb64 + (h[:, i] % rpb64)).astype(np.int64)
    return rows
