"""BIGSI index: dense bit-slice matrix + metadata, with two on-disk formats.

TPU-native layout: instead of the reference's hash map of sparse rows
(bigsi.rs:20-49 ``FnvHashMap<usize, BitVec>``), the index is a dense packed
uint32 matrix of shape [bloom_size, W] with W = ceil(n_colors/32); bit c of
word (r, c//32) says color c has Bloom bit r. "Row absent from the map" in
the reference is exactly "row is all-zero" here (the reference drops all-zero
rows at build time, build.rs:123-127, 247-254), so no separate occupancy
structure is needed.

Formats:
- native ``CXI1``: magic + JSON header + raw little-endian uint32 matrix,
  64-byte aligned so it can be memory-mapped.
- reference-compatible bincode ``.bxi``/``.mxi`` (bigsi.rs:51-89): fixint
  little-endian bincode of BigsyMapNew/BigsyMapMiniNew, with rows as the
  vendored BitVec {storage: Vec<u32>, nbits} (bit i at word i/32, bit i%32 —
  bit-vec_serde/src/lib.rs:465-500). Round-trips indexes with the Rust tool.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"CXI1"


@dataclass
class BigsiIndex:
    bloom_size: int
    num_hash: int
    k_size: int
    m_size: int  # 0 => k-mer index (.bxi), >0 => minimizer index (.mxi)
    colors: list[str]  # color id -> accession (dense, sorted at build)
    n_ref_kmers: dict[str, int]
    matrix: np.ndarray  # uint32 [bloom_size, W]
    blocked: int = 0  # turbo layout version: 0 = classic rows; 1 = all H
    # rows of a k-mer share one 512-byte block (single fetch per k-mer);
    # 2 = split-lane blocked (hash h confined to its own lane group, the
    # sorted-stream kernel's layout); 3 = value-addressed split-lane
    # (block monotone in the k-mer value + fmix64 offsets — sorted query
    # batches stream the matrix in order); 4 = value-addressed with the
    # canonical-density-corrected block map (uniform block loads, the
    # build default). Not bit-compatible with the reference's hash
    # placement — see ops/blocked.py.
    place_rpb: int = 0  # explicit blocked-placement rows-per-block; 0 =
    # derived from the full row width. Set by `build --color-shards N`:
    # the placement then matches each color shard's local geometry so the
    # sorted-stream kernel runs per shard on a ("data", "color") mesh
    # (parallel/sharded.py::stream_batch_colorshard) for indexes wider
    # than the single-device stream limit (> 1024 colors).

    @property
    def n_colors(self) -> int:
        return len(self.colors)

    @property
    def words_per_row(self) -> int:
        if self.matrix is None:  # metadata-only (e.g. row-sharded build)
            return (self.n_colors + 31) // 32
        return self.matrix.shape[1]

    def color_map(self) -> dict[int, str]:
        return dict(enumerate(self.colors))

    # -- native format ------------------------------------------------------

    def save(self, path: str) -> None:
        header = {
            "bloom_size": self.bloom_size,
            "num_hash": self.num_hash,
            "k_size": self.k_size,
            "m_size": self.m_size,
            "colors": self.colors,
            "n_ref_kmers": self.n_ref_kmers,
            "words_per_row": int(self.matrix.shape[1]),
            "blocked": int(self.blocked),
            "place_rpb": int(self.place_rpb),
        }
        hjson = json.dumps(header).encode("utf-8")
        with open(path, "wb") as f:
            f.write(MAGIC)
            f.write(struct.pack("<Q", len(hjson)))
            f.write(hjson)
            pad = (-f.tell()) % 64
            f.write(b"\0" * pad)
            f.write(np.ascontiguousarray(self.matrix, dtype="<u4").tobytes())

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "BigsiIndex":
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != MAGIC:
                if _looks_like_bincode(path):
                    return read_bxi(path)
                raise ValueError(f"{path}: not a CXI1 or bincode bigsi index")
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen).decode("utf-8"))
            off = f.tell()
            off += (-off) % 64
        W = header["words_per_row"]
        R = header["bloom_size"]
        if mmap:
            matrix = np.memmap(path, dtype="<u4", mode="r", offset=off, shape=(R, W))
        else:
            matrix = np.fromfile(path, dtype="<u4", offset=off).reshape(R, W)
        return cls(
            bloom_size=header["bloom_size"],
            num_hash=header["num_hash"],
            k_size=header["k_size"],
            m_size=header["m_size"],
            colors=header["colors"],
            n_ref_kmers={k: int(v) for k, v in header["n_ref_kmers"].items()},
            matrix=matrix,
            blocked=int(header.get("blocked", 0)),
            place_rpb=int(header.get("place_rpb", 0)),
        )


def _looks_like_bincode(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(8)
    if len(head) < 8:
        return False
    (bloom_size,) = struct.unpack("<Q", head)
    return 0 < bloom_size < (1 << 40)


# -- reference bincode interop ---------------------------------------------


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.o = 0

    def u64(self) -> int:
        (v,) = struct.unpack_from("<Q", self.d, self.o)
        self.o += 8
        return v

    def bytes_(self, n: int) -> bytes:
        b = self.d[self.o : self.o + n]
        self.o += n
        return b

    def string(self) -> str:
        n = self.u64()
        return self.bytes_(n).decode("utf-8")


def read_bxi(path: str) -> BigsiIndex:
    """Read a reference-built .bxi/.mxi (bincode BigsyMapNew/BigsyMapMiniNew)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    bloom_size = r.u64()
    num_hash = r.u64()
    k_size = r.u64()
    is_mini = path.endswith(".mxi")
    m_size = r.u64() if is_mini else 0
    ncolors = r.u64()
    colors_map: dict[int, str] = {}
    for _ in range(ncolors):
        c = r.u64()
        colors_map[c] = r.string()
    colors = [colors_map[i] for i in range(len(colors_map))]
    W = (len(colors) + 31) // 32
    nrows = r.u64()
    matrix = np.zeros((bloom_size, W), dtype=np.uint32)
    for _ in range(nrows):
        row = r.u64()
        nwords = r.u64()
        words = np.frombuffer(r.bytes_(4 * nwords), dtype="<u4")
        _nbits = r.u64()
        matrix[row, :nwords] = words
    n_ref = {}
    nref = r.u64()
    for _ in range(nref):
        s = r.string()
        n_ref[s] = r.u64()
    return BigsiIndex(
        bloom_size=bloom_size,
        num_hash=num_hash,
        k_size=k_size,
        m_size=m_size,
        colors=colors,
        n_ref_kmers=n_ref,
        matrix=matrix,
    )


def write_bxi(index: BigsiIndex, path: str) -> None:
    """Write a reference-compatible bincode .bxi/.mxi (rows sorted; the
    reference serializes HashMap order, which is irrelevant on read)."""
    if index.blocked:
        raise ValueError(
            "blocked (turbo) indexes use a different hash placement and "
            "cannot be exported to the reference format"
        )
    out = bytearray()

    def u64(v: int) -> None:
        out.extend(struct.pack("<Q", v))

    def string(s: str) -> None:
        b = s.encode("utf-8")
        u64(len(b))
        out.extend(b)

    u64(index.bloom_size)
    u64(index.num_hash)
    u64(index.k_size)
    if index.m_size:
        u64(index.m_size)
    u64(len(index.colors))
    for c, name in enumerate(index.colors):
        u64(c)
        string(name)
    nonzero = np.nonzero(index.matrix.any(axis=1))[0]
    u64(len(nonzero))
    nbits = len(index.colors)
    W = index.matrix.shape[1]
    for row in nonzero:
        u64(int(row))
        u64(W)
        out.extend(np.ascontiguousarray(index.matrix[row], dtype="<u4").tobytes())
        u64(nbits)
    u64(len(index.n_ref_kmers))
    for name, n in index.n_ref_kmers.items():
        string(name)
        u64(int(n))
    with open(path, "wb") as f:
        f.write(bytes(out))
