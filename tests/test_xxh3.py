"""Validate the from-scratch XXH3 against the reference C implementation
(the `xxhash` wheel) across every length class and seed regime used by the
engine (seeds 0..num_hash-1; k-mer lengths ~15..63)."""

import numpy as np
import pytest

xxhash = pytest.importorskip("xxhash")

from colorid_tpu.hashing.xxh3 import xxh3_64, xxh3_64_batch, bloom_rows_batch


SEEDS = [0, 1, 2, 3, 7, 12345, 2**33 + 17, 2**63 + 5]


def test_scalar_all_lengths():
    rng = np.random.default_rng(0)
    for n in list(range(0, 64)) + [95, 96, 97, 127, 128, 129, 160, 239, 240]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for seed in SEEDS:
            assert xxh3_64(data, seed) == xxhash.xxh3_64_intdigest(data, seed), (
                n,
                seed,
            )


def test_scalar_rejects_long():
    with pytest.raises(ValueError):
        xxh3_64(b"x" * 241)


def test_batch_matches_scalar():
    rng = np.random.default_rng(1)
    for n in [0, 1, 2, 3, 4, 5, 8, 9, 15, 16, 17, 21, 27, 31, 33, 63, 65, 97, 129, 240]:
        keys = rng.integers(0, 256, (50, n), dtype=np.uint8)
        for seed in [0, 1, 3, 2**40]:
            got = xxh3_64_batch(keys, seed)
            want = np.array(
                [xxhash.xxh3_64_intdigest(k.tobytes(), seed) for k in keys],
                dtype=np.uint64,
            )
            np.testing.assert_array_equal(got, want)


def test_batch_empty():
    assert xxh3_64_batch(np.zeros((0, 31), dtype=np.uint8)).shape == (0,)


def test_acgt_kmers():
    """The real input distribution: ACGT strings at colorid's default sizes."""
    rng = np.random.default_rng(2)
    for k in [15, 21, 27, 31]:
        keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(200, k))
        for seed in range(4):
            got = xxh3_64_batch(keys, seed)
            want = np.array(
                [xxhash.xxh3_64_intdigest(kk.tobytes(), seed) for kk in keys],
                dtype=np.uint64,
            )
            np.testing.assert_array_equal(got, want)


def test_bloom_rows():
    keys = np.frombuffer(b"ATGCATGCATGCATGCATGCATGCATG", dtype=np.uint8)[None, :]
    rows = bloom_rows_batch(keys, num_hash=4, bloom_size=750000)
    want = [xxhash.xxh3_64_intdigest(keys.tobytes(), s) % 750000 for s in range(4)]
    assert rows[0].tolist() == want
