"""Fnv/hashbrown iteration-order emulation: known FNV vectors, hashbrown
edge cases, and cross-validation of the two independent implementations
(Python core/fnv.py vs C++ native/ingest.cpp)."""

import numpy as np
import pytest

from colorid_tpu import native
from colorid_tpu.core.fnv import (
    HashbrownOrder,
    fnv1a64,
    fnv1a64_batch,
    fnv1a64_str,
    fnv1a64_usize,
    fnv_map_order_usize,
    fnv_set_ranks,
    hashbrown_iteration_order,
)

ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def test_fnv1a64_known_vectors():
    # published FNV-1a 64 test vectors
    assert fnv1a64(b"") == 0xCBF29CE484222325
    assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C
    assert fnv1a64(b"foobar") == 0x85944171F73967E8
    # str hashing appends 0xff (Rust Hash for str)
    assert fnv1a64_str(b"a") == ((0xAF63DC4C8601EC8C ^ 0xFF) * 0x100000001B3) % 2**64
    # usize hashing = 8 LE bytes
    assert fnv1a64_usize(0) == fnv1a64(b"\x00" * 8)
    assert fnv1a64_usize(1) == fnv1a64(b"\x01" + b"\x00" * 7)


def test_fnv_batch_matches_scalar():
    rng = np.random.default_rng(0)
    keys = ACGT[rng.integers(0, 4, (64, 31))]
    hb = fnv1a64_batch(keys)
    for i in range(64):
        assert int(hb[i]) == fnv1a64_str(keys[i].tobytes())


def test_hashbrown_small_table_wrap():
    """Three inserts whose h1 all land on the last bucket of a 4-bucket
    table exercise the wrapped-group FULL-slot fallback (hashbrown's
    find_insert_slot small-table special case)."""
    t = HashbrownOrder()
    # h1 = hash & 3 == 3; distinct h2s for clarity
    hashes = [(h2 << 57) | 3 for h2 in (1, 2, 3)]
    for i, h in enumerate(hashes):
        t.insert(h, i)
    # placement: 3, then wrap to 0, then the aligned-group fallback -> 1
    assert list(t.iteration_order()) == [1, 2, 0]


def test_hashbrown_growth_and_permutation():
    rng = np.random.default_rng(1)
    for n in [1, 3, 4, 7, 8, 14, 15, 28, 29, 56, 57, 112, 113, 224, 500]:
        hashes = rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)
        order = hashbrown_iteration_order(hashes)
        assert sorted(order.tolist()) == list(range(n))
        # deterministic
        assert np.array_equal(order, hashbrown_iteration_order(hashes))


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_cpp_matches_python_bytes():
    rng = np.random.default_rng(2)
    for n in [1, 2, 3, 4, 7, 8, 15, 16, 17, 64, 230, 1000, 5000]:
        w = int(rng.choice([4, 15, 21, 31, 32]))
        ks = ACGT[rng.integers(0, 4, (n, w))]
        _, idx = np.unique(ks, axis=0, return_index=True)
        ks = ks[np.sort(idx)]
        py = fnv_set_ranks(fnv1a64_batch(ks))
        cc = native.fnv_ranks_bytes(ks)
        assert np.array_equal(py, cc.astype(np.int64)), n


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_cpp_matches_python_packed():
    """ct_fnv_ranks over packed u64 keys (multiple sets in one call) agrees
    with the Python emulation over the decoded ASCII strings."""
    rng = np.random.default_rng(3)
    width = 27
    sets, bounds, packed = [], [0], []
    for s in rng.integers(1, 300, 25):
        codes = rng.integers(0, 4, (int(s), width))
        ks = ACGT[codes]
        _, idx = np.unique(ks, axis=0, return_index=True)
        keep = np.sort(idx)
        sets.append(ks[keep])
        bounds.append(bounds[-1] + len(keep))
        for row in codes[keep]:
            v = 0
            for c in row:
                v = (v << 2) | int(c)
            packed.append(v)
    cc = native.fnv_ranks_packed(
        np.array(packed, dtype=np.uint64), np.array(bounds), width
    )
    off = 0
    for ks in sets:
        py = fnv_set_ranks(fnv1a64_batch(ks))
        assert np.array_equal(py, cc[off : off + ks.shape[0]].astype(np.int64))
        off += ks.shape[0]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_read_sets_packed_fnv_pos():
    """The inline fnv ranks computed during native set building equal a
    post-hoc ct_fnv_ranks pass over the emitted keys."""
    rng = np.random.default_rng(4)
    k = 21
    seqs = [ACGT[rng.integers(0, 4, int(L))] for L in rng.integers(60, 200, 40)]
    offs = np.zeros(len(seqs) + 1, dtype=np.int64)
    offs[1:] = np.cumsum([len(s) for s in seqs])
    concat = np.concatenate(seqs)
    nseqs = np.ones(len(seqs), dtype=np.int32)
    packed, seg, pos, maplen = native.read_sets_packed(
        concat, offs, nseqs, k, 1, 0, fnv_order=True
    )
    pk0, seg0, pos0, maplen0 = native.read_sets_packed(
        concat, offs, nseqs, k, 1, 0, fnv_order=False
    )
    assert np.array_equal(packed, pk0) and np.array_equal(seg, seg0)
    assert np.array_equal(maplen, maplen0)
    keys64 = packed[:, 0].astype(np.uint64) | (
        packed[:, 1].astype(np.uint64) << np.uint64(32)
    )
    bounds = np.zeros(len(seqs) + 1, dtype=np.int64)
    bounds[1:] = np.cumsum(maplen)
    want = native.fnv_ranks_packed(keys64, bounds, k)
    assert np.array_equal(pos.astype(np.int32), want)
    assert np.array_equal(pos0.astype(np.int64), np.concatenate(
        [np.arange(n) for n in maplen]
    ))


def test_fnv_map_order_usize_nontrivial():
    keys = list(range(40))
    order = fnv_map_order_usize(keys)
    assert sorted(order) == keys
    assert order != keys  # hash order, not insertion order


# -- second independently-written oracle (VERDICT r3 #8) ---------------------


def test_swiss_oracle_matches_production_random():
    """core/fnv.py (numpy ctrl array + mirrored tail) vs tests/swiss_oracle
    (dict + mathematical phantom/mirror index rule): a transcription slip in
    either formulation shows up as an order mismatch."""
    from tests.swiss_oracle import swiss_iteration_order

    rng = np.random.default_rng(11)
    for n in [1, 2, 3, 4, 5, 6, 7, 8, 13, 14, 15, 27, 28, 29, 55, 56, 57,
              111, 112, 113, 223, 224, 225, 448, 449, 1000]:
        hashes = rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)
        want = hashbrown_iteration_order(hashes).tolist()
        got = swiss_iteration_order(hashes)
        assert got == want, f"n={n}"


def test_swiss_oracle_small_table_adversarial():
    """All h1/h2 collision patterns on 4- and 8-bucket tables (the phantom
    slot + wrapped-group fallback corner the round-2 advisor flagged)."""
    from tests.swiss_oracle import swiss_iteration_order

    rng = np.random.default_rng(13)
    for _ in range(300):
        n = int(rng.integers(1, 8))
        # force h1 collisions: few distinct low bits, random h2 (top 7)
        h1s = rng.integers(0, 4, n, dtype=np.uint64)
        h2s = rng.integers(0, 128, n, dtype=np.uint64)
        hashes = (h2s << np.uint64(57)) | h1s
        hashes = np.unique(hashes)[
            np.argsort(rng.random(np.unique(hashes).size))
        ]
        want = hashbrown_iteration_order(hashes).tolist()
        got = swiss_iteration_order(hashes)
        assert got == want


def test_swiss_oracle_growth_boundaries():
    """Exactly-at-resize sizes (capacity = 3, 7, then 7/8 fill points)."""
    from tests.swiss_oracle import swiss_iteration_order

    rng = np.random.default_rng(17)
    for n in [3, 4, 7, 8, 14, 15, 28, 29, 56, 57, 112, 113, 224, 225]:
        for trial in range(5):
            hashes = rng.integers(
                0, 2**63, n, dtype=np.int64
            ).astype(np.uint64)
            assert swiss_iteration_order(hashes) == (
                hashbrown_iteration_order(hashes).tolist()
            )
