"""Byte-level bincode interop evidence that does NOT share code with
index/bigsi.py: a hand-constructed fixture transcribed field-by-field from
the reference's serde layout (BigsyMapNew, /root/reference/src/bigsi.rs:20-27;
BitVec {storage: Vec<u32>, nbits: usize}, bit-vec_serde/src/lib.rs:218-224;
bincode 1.x defaults = fixint little-endian, u64 length prefixes), plus an
independent minimal decoder used to re-read write_bxi output."""

import struct

import numpy as np
import pytest

from colorid_tpu.index.bigsi import BigsiIndex, read_bxi, write_bxi


def _u64(v):
    return struct.pack("<Q", v)


def _string(s):
    b = s.encode()
    return _u64(len(b)) + b


def _bitvec(words, nbits):
    return _u64(len(words)) + b"".join(struct.pack("<I", w) for w in words) + _u64(nbits)


def _fixture_bytes():
    """BigsyMapNew { bloom_size: 16, num_hash: 2, k_size: 5,
    colors: {0: "A", 1: "Bee"}, map: {3: BitVec([0b01], 2),
    7: BitVec([0b11], 2)}, n_ref_kmers: {"A": 10, "Bee": 20} } under
    bincode 1.x defaults. Map entry order is arbitrary in the reference
    (FnvHashMap serialization order); this fixture lists keys ascending,
    which is also what write_bxi emits."""
    out = b""
    out += _u64(16)  # bloom_size
    out += _u64(2)  # num_hash
    out += _u64(5)  # k_size
    out += _u64(2)  # colors: len
    out += _u64(0) + _string("A")
    out += _u64(1) + _string("Bee")
    out += _u64(2)  # map: len
    out += _u64(3) + _bitvec([0b01], 2)
    out += _u64(7) + _bitvec([0b11], 2)
    out += _u64(2)  # n_ref_kmers: len
    out += _string("A") + _u64(10)
    out += _string("Bee") + _u64(20)
    return out


def test_read_bxi_parses_handwritten_fixture(tmp_path):
    p = str(tmp_path / "fixture.bxi")
    with open(p, "wb") as f:
        f.write(_fixture_bytes())
    idx = read_bxi(p)
    assert idx.bloom_size == 16
    assert idx.num_hash == 2
    assert idx.k_size == 5
    assert idx.m_size == 0
    assert idx.colors == ["A", "Bee"]
    assert idx.n_ref_kmers == {"A": 10, "Bee": 20}
    assert idx.matrix.shape == (16, 1)
    # BitVec bit b of block w == bit (w*32 + b): LSB-first within the word
    # (bit-vec_serde get(): block & (1 << b), lib.rs:465-474)
    assert idx.matrix[3, 0] == 0b01  # color 0 only
    assert idx.matrix[7, 0] == 0b11  # both colors
    assert (np.delete(idx.matrix[:, 0], [3, 7]) == 0).all()


def test_write_bxi_bytes_match_fixture(tmp_path):
    matrix = np.zeros((16, 1), dtype=np.uint32)
    matrix[3, 0] = 0b01
    matrix[7, 0] = 0b11
    idx = BigsiIndex(
        bloom_size=16,
        num_hash=2,
        k_size=5,
        m_size=0,
        colors=["A", "Bee"],
        n_ref_kmers={"A": 10, "Bee": 20},
        matrix=matrix,
    )
    p = str(tmp_path / "written.bxi")
    write_bxi(idx, p)
    assert open(p, "rb").read() == _fixture_bytes()


def _independent_decode(data):
    """Minimal BigsyMap(Mini)New decoder written against the serde layout
    directly (separate transcription from index/bigsi.py::read_bxi)."""
    o = [0]

    def u64():
        (v,) = struct.unpack_from("<Q", data, o[0])
        o[0] += 8
        return v

    def text():
        n = u64()
        s = data[o[0] : o[0] + n].decode()
        o[0] += n
        return s

    out = {"bloom_size": u64(), "num_hash": u64(), "k_size": u64()}
    # BigsyMapMiniNew has m_size here; the caller tells us which struct
    out["colors"] = {}
    for _ in range(u64()):
        k = u64()
        out["colors"][k] = text()
    out["rows"] = {}
    for _ in range(u64()):
        row = u64()
        nw = u64()
        words = list(struct.unpack_from(f"<{nw}I", data, o[0]))
        o[0] += 4 * nw
        nbits = u64()
        out["rows"][row] = (words, nbits)
    out["n_ref_kmers"] = {}
    for _ in range(u64()):
        s = text()
        out["n_ref_kmers"][s] = u64()
    assert o[0] == len(data), "trailing bytes"
    return out


def test_write_bxi_independent_decoder_roundtrip(tmp_path):
    """Build a small real index, export with write_bxi, decode with the
    test-local decoder, and check every field against the index."""
    from colorid_tpu.pipelines.build import build_index

    REFS = "/root/reference/test_data/refs"
    ref_map = {
        "B021": [f"{REFS}/Listeria_phage_B021.fasta"],
        "B056": [f"{REFS}/Listeria_phage_B056.fasta"],
    }
    index = build_index(ref_map, 50_000, 2, 21, verbose=False)
    p = str(tmp_path / "real.bxi")
    write_bxi(index, p)
    got = _independent_decode(open(p, "rb").read())
    assert got["bloom_size"] == index.bloom_size
    assert got["num_hash"] == index.num_hash
    assert got["k_size"] == index.k_size
    assert got["colors"] == {i: n for i, n in enumerate(index.colors)}
    assert got["n_ref_kmers"] == index.n_ref_kmers
    matrix = np.asarray(index.matrix)
    nonzero = set(np.nonzero(matrix.any(axis=1))[0].tolist())
    assert set(got["rows"]) == nonzero
    for row, (words, nbits) in got["rows"].items():
        assert nbits == len(index.colors)
        assert (matrix[row] == np.array(words, dtype=np.uint32)).all()


def test_mini_fixture_roundtrip(tmp_path):
    """BigsyMapMiniNew (.mxi) adds m_size after k_size (bigsi.rs:41-49)."""
    out = b""
    out += _u64(8) + _u64(1) + _u64(9) + _u64(4)  # bloom, hashes, k, m
    out += _u64(1) + _u64(0) + _string("only")
    out += _u64(1) + _u64(5) + _bitvec([1], 1)
    out += _u64(1) + _string("only") + _u64(3)
    p = str(tmp_path / "fixture.mxi")
    with open(p, "wb") as f:
        f.write(out)
    idx = read_bxi(p)
    assert (idx.bloom_size, idx.num_hash, idx.k_size, idx.m_size) == (8, 1, 9, 4)
    assert idx.colors == ["only"]
    assert idx.matrix[5, 0] == 1
    mp = str(tmp_path / "written.mxi")
    write_bxi(idx, mp)
    assert open(mp, "rb").read() == out
