"""Device XXH3 vs the validated numpy implementation."""

import numpy as np
import pytest

from colorid_tpu.hashing.xxh3 import bloom_rows_batch, xxh3_64_batch
from colorid_tpu.ops.hash_jax import bloom_rows_device, pack_keys_host


@pytest.mark.parametrize("k", [4, 5, 8, 9, 15, 16, 17, 21, 27, 31, 32])
def test_device_rows_match(k):
    rng = np.random.default_rng(k)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(500, k))
    packed = pack_keys_host(keys)
    assert packed is not None
    blooms = [750_000, 50_000_000, (1 << 30) - 1] if k == 27 else [750_000]
    for bloom in blooms:
        want = bloom_rows_batch(keys, 4, bloom).astype(np.int32)
        got = np.asarray(bloom_rows_device(packed, k=k, num_hash=4, bloom_size=bloom))
        np.testing.assert_array_equal(got, want)


def test_pack_rejects_non_acgt():
    assert pack_keys_host(np.frombuffer(b"ACGN", dtype=np.uint8)[None]) is None
    assert pack_keys_host(np.frombuffer(b"acgt", dtype=np.uint8)[None]) is None


def test_barrett_equals_horner():
    import jax.numpy as jnp
    from colorid_tpu.ops.hash_jax import _mod_barrett, _mod_horner

    rng = np.random.default_rng(9)
    lo = jnp.asarray(rng.integers(0, 2**32, 4096, dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 2**32, 4096, dtype=np.uint32))
    for m in [3, 750_000, 50_000_000, (1 << 30) - 1, 1 << 29]:
        a = np.asarray(_mod_barrett((lo, hi), m))
        b = np.asarray(_mod_horner((lo, hi), m))
        np.testing.assert_array_equal(a, b)


def test_barrett_wide_modulus():
    """m in [2^30, 2^31): the widened device envelope (the reference accepts
    any usize bloom size, simple_bloom.rs:13-26; int32 block addressing caps
    the device path at 2^31)."""
    import jax.numpy as jnp
    from colorid_tpu.ops.hash_jax import _mod_barrett

    rng = np.random.default_rng(10)
    lo = rng.integers(0, 2**32, 8192, dtype=np.uint64)
    hi = rng.integers(0, 2**32, 8192, dtype=np.uint64)
    h = (hi << np.uint64(32)) | lo
    for m in [1 << 30, (1 << 30) + 1, (3 << 29) + 12345, (1 << 31) - 1]:
        want = (h % np.uint64(m)).astype(np.uint32)
        got = np.asarray(
            _mod_barrett(
                (jnp.asarray(lo.astype(np.uint32)), jnp.asarray(hi.astype(np.uint32))),
                m,
            )
        )
        np.testing.assert_array_equal(got, want)


def test_device_rows_wide_bloom():
    """bloom_size >= 2^30 stays on the device hash path end to end."""
    rng = np.random.default_rng(11)
    keys = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(300, 31))
    packed = pack_keys_host(keys)
    bloom = (1 << 31) - 9
    want = bloom_rows_batch(keys, 4, bloom).astype(np.int32)
    got = np.asarray(bloom_rows_device(packed, k=31, num_hash=4, bloom_size=bloom))
    np.testing.assert_array_equal(got, want)
