"""Device-side canonical k-mer extraction + counting from 2-bit packed reads.

The host ships reads as 2-bit base codes (16 bases per uint32 word, ~0.27
bytes/base) and the device does everything the reference's host-side k-mer
counting stage does (kmer.rs:87-299 canonical windows + kmer.rs:826-837
frequency filter): window extraction, forward/revcomp canonicalization
(A<C<G<T 2-bit ordering == byte-lexicographic ordering, kmer.rs:104),
sort-unique counting and the strictly-greater-than frequency filter. The
filtered unique k-mers never exist host-side at all — they feed the fused
hash/gather/count query kernels (ops/query.py) device-resident, cutting the
host->device link from 10 bytes per unique k-mer to ~0.27 bytes per read
base (the link, not the kernel, bounds end-to-end search rate on thin
links; PERF.md).

Only uppercase ACGT reads take this path; callers route reads containing
N/lowercase to the exact host path (the same split the read_id frontend
already does), preserving bit-exact parity with kmer.rs semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

_CODE = np.full(256, 255, dtype=np.uint8)
_CODE[ord("A")] = 0
_CODE[ord("C")] = 1
_CODE[ord("G")] = 2
_CODE[ord("T")] = 3


def words_per_read(L: int) -> int:
    return (L + 15) // 16


def pack_reads(seqs: np.ndarray) -> np.ndarray | None:
    """ASCII reads [R, L] uint8 -> 2-bit words [R, ceil(L/16)] uint32.

    Base i of a read sits at bits [2*(15 - i%16), +2) of word i//16 (first
    base in the most significant bits). Returns None when any byte is
    outside uppercase ACGT (caller uses the exact host path then).
    """
    R, L = seqs.shape
    codes = _CODE[seqs]
    if (codes == 255).any():
        return None
    Lw = words_per_read(L)
    cp = np.zeros((R, Lw * 16), dtype=np.uint32)
    cp[:, :L] = codes
    shifts = (2 * (15 - np.arange(16, dtype=np.uint32))).astype(np.uint32)
    return (cp.reshape(R, Lw, 16) << shifts).sum(axis=2, dtype=np.uint32)


def pack_reads_masked(seqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """pack_reads with per-read routing: returns (words [R, ceil(L/16)],
    clean bool [R]). Dirty reads (any byte outside uppercase ACGT) pack as
    all-A placeholders with clean[i] == False so callers can send only the
    clean rows through the device fast path and route the dirty minority to
    the exact host path (the reference skips only N-containing windows,
    kmer.rs:87-125, so a whole-batch reject would be needlessly coarse)."""
    R, L = seqs.shape
    codes = _CODE[seqs]
    clean = ~(codes == 255).any(axis=1)
    codes = np.where(clean[:, None], codes, np.uint8(0))
    Lw = words_per_read(L)
    cp = np.zeros((R, Lw * 16), dtype=np.uint32)
    cp[:, :L] = codes
    shifts = (2 * (15 - np.arange(16, dtype=np.uint32))).astype(np.uint32)
    return (cp.reshape(R, Lw, 16) << shifts).sum(axis=2, dtype=np.uint32), clean


def pack_reads_valid(seqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ASCII reads [R, L] -> (2-bit words [R, ceil(L/16)], per-base validity
    bitplane [R, ceil(L/32)] uint32, little-endian). Bytes outside uppercase
    ACGT pack as 'A' with their validity bit 0; the device skips windows
    touching an invalid base exactly like the reference skips N-containing
    windows (kmer.rs:87-125). ~0.03 extra bytes/base on the host link."""
    R, L = seqs.shape
    codes = _CODE[seqs]
    ok = codes != 255
    codes = np.where(ok, codes, np.uint8(0))
    Lw = words_per_read(L)
    cp = np.zeros((R, Lw * 16), dtype=np.uint32)
    cp[:, :L] = codes
    shifts = (2 * (15 - np.arange(16, dtype=np.uint32))).astype(np.uint32)
    words = (cp.reshape(R, Lw, 16) << shifts).sum(axis=2, dtype=np.uint32)
    Lb = ((L + 31) // 32) * 32
    okp = np.zeros((R, Lb), dtype=np.uint8)
    okp[:, :L] = ok
    vbits = np.packbits(okp, axis=1, bitorder="little")
    return words, vbits.reshape(R, -1, 4).view(np.uint32)[:, :, 0].copy()


def _window_valid_ok(valid_bits: jnp.ndarray, L: int, k: int, NW: int):
    """bool [R, NW]: window w has all k bases valid (prefix-sum over the
    unpacked per-base validity bitplane)."""
    R = valid_bits.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    vb = ((valid_bits[:, :, None] >> shifts) & jnp.uint32(1)).reshape(R, -1)
    inv = (jnp.uint32(1) - vb[:, :L]).astype(jnp.int32)
    c = jnp.concatenate(
        [jnp.zeros((R, 1), dtype=jnp.int32), jnp.cumsum(inv, axis=1)], axis=1
    )
    return (c[:, k:] - c[:, :NW]) == 0


def _unpack_codes(words: jnp.ndarray, L: int) -> jnp.ndarray:
    """[R, Lw] uint32 words -> [R, L] uint32 base codes (0..3)."""
    R, Lw = words.shape
    shifts = (2 * (15 - jnp.arange(16, dtype=jnp.uint32))).astype(jnp.uint32)
    codes = (words[:, :, None] >> shifts[None, None, :]) & U32(3)
    return codes.reshape(R, Lw * 16)[:, :L]


def _window_limbs(codes: jnp.ndarray, k: int, NW: int):
    """Canonical (lo, hi) uint32 limbs of every k-window of every read.

    Forward value = sum_j code[w+j] << 2*(k-1-j) (pack_keys_host layout);
    revcomp value = sum_j (3-code[w+j]) << 2*j. Canonical = the
    lexicographically smaller of the two (kmer.rs:104 string compare ==
    2-bit integer compare under A<C<G<T).
    """
    z = jnp.zeros_like(codes[:, :NW])
    f_lo, f_hi = z, z
    r_lo, r_hi = z, z
    for j in range(k):
        c = codes[:, j : j + NW]
        s = 2 * (k - 1 - j)
        if s >= 32:
            f_hi = f_hi + (c << U32(s - 32))
        else:
            f_lo = f_lo + (c << U32(s))
        rc = U32(3) - c
        t = 2 * j
        if t >= 32:
            r_hi = r_hi + (rc << U32(t - 32))
        else:
            r_lo = r_lo + (rc << U32(t))
    fwd_le = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
    lo = jnp.where(fwd_le, f_lo, r_lo)
    hi = jnp.where(fwd_le, f_hi, r_hi)
    return lo, hi


@partial(jax.jit, static_argnames=("k", "L", "filter_t", "d"))
def extract_count(
    reads_packed: jnp.ndarray,  # uint32 [R, ceil(L/16)]
    lens: jnp.ndarray,  # int32 [R] true read lengths (<= L)
    valid_bits: jnp.ndarray | None = None,  # uint32 [R, ceil(L/32)] or None
    *,
    k: int,
    L: int,
    filter_t: int,
    d: int = 1,
):
    """Unique filtered canonical k-mers of a packed read batch, on device.

    Returns (packed [N, 2] uint32 (lo, hi), qcounts int32 [N], n_unique
    int32 scalar) with N = R * (L - k + 1): the first n_unique entries are
    the distinct canonical k-mers with count > filter_t (in sorted key
    order) and their exact counts; every later slot has qcounts == 0 (the
    query kernels' padding marker). Windows are taken at stride ``d``
    (kmerize step_by) and only where the window fits the read's true
    length; counting replicates clean_map's strictly-greater filter
    (kmer.rs:826-837).
    """
    R = reads_packed.shape[0]
    NW = L - k + 1
    if NW <= 0:
        raise ValueError("L < k")
    codes = _unpack_codes(reads_packed, L)
    lo, hi = _window_limbs(codes, k, NW)
    w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
    valid = w_idx + k <= lens[:, None]
    if d > 1:
        valid = valid & (w_idx % d == 0)
    if valid_bits is not None:
        valid = valid & _window_valid_ok(valid_bits, L, k, NW)
    SENT = U32(0xFFFFFFFF)  # > any canonical key (canonical(T^32) = A^32)
    lo = jnp.where(valid, lo, SENT).reshape(-1)
    hi = jnp.where(valid, hi, SENT).reshape(-1)
    N = R * NW
    s_hi, s_lo = jax.lax.sort((hi, lo), num_keys=2)
    iota = jnp.arange(N, dtype=jnp.int32)
    prev_hi = jnp.roll(s_hi, 1)
    prev_lo = jnp.roll(s_lo, 1)
    new = (iota == 0) | (s_hi != prev_hi) | (s_lo != prev_lo)
    # run length at each group start = next group start - own position
    starts = jnp.where(new, iota, np.int32(N))
    suffix_min = jax.lax.cummin(starts, axis=0, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), N, dtype=jnp.int32)]
    )
    count = next_start - iota
    keep = new & ~((s_hi == SENT) & (s_lo == SENT)) & (count > filter_t)
    n_unique = keep.sum().astype(jnp.int32)
    pos = jnp.cumsum(keep) - 1
    to = jnp.where(keep, pos, np.int32(N)).astype(jnp.int32)
    out = jnp.zeros((N, 2), dtype=jnp.uint32)
    out = out.at[to].set(jnp.stack([s_lo, s_hi], axis=1), mode="drop")
    qc = jnp.zeros(N, dtype=jnp.int32).at[to].set(count, mode="drop")
    return out, qc, n_unique


@partial(jax.jit, static_argnames=("k", "L", "d", "cap"))
def count_histogram(
    reads_packed: jnp.ndarray,
    lens: jnp.ndarray,
    valid_bits: jnp.ndarray | None = None,
    *,
    k: int,
    L: int,
    d: int = 1,
    cap: int = 65536,
):
    """Histogram of per-unique-k-mer counts (for auto_cutoff, kmer.rs:866):
    hist[c] = number of distinct canonical k-mers seen exactly c times
    (c >= cap clips into the top bin). Device-side twin of the counting in
    extract_count so a search without -f can infer the cutoff from one tiny
    D2H fetch before filtering."""
    R = reads_packed.shape[0]
    NW = L - k + 1
    if NW <= 0:
        raise ValueError("L < k")
    codes = _unpack_codes(reads_packed, L)
    lo, hi = _window_limbs(codes, k, NW)
    w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
    valid = w_idx + k <= lens[:, None]
    if d > 1:
        valid = valid & (w_idx % d == 0)
    if valid_bits is not None:
        valid = valid & _window_valid_ok(valid_bits, L, k, NW)
    SENT = U32(0xFFFFFFFF)
    lo = jnp.where(valid, lo, SENT).reshape(-1)
    hi = jnp.where(valid, hi, SENT).reshape(-1)
    N = R * NW
    s_hi, s_lo = jax.lax.sort((hi, lo), num_keys=2)
    iota = jnp.arange(N, dtype=jnp.int32)
    new = (iota == 0) | (s_hi != jnp.roll(s_hi, 1)) | (s_lo != jnp.roll(s_lo, 1))
    starts = jnp.where(new, iota, np.int32(N))
    suffix_min = jax.lax.cummin(starts, axis=0, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), N, dtype=jnp.int32)]
    )
    count = next_start - iota
    keep = new & ~((s_hi == SENT) & (s_lo == SENT))
    c = jnp.clip(count, 0, cap - 1)
    return (
        jnp.zeros(cap, dtype=jnp.int32)
        .at[jnp.where(keep, c, cap)]
        .add(1, mode="drop")
    )


def pack_reads_any(seqs: np.ndarray) -> np.ndarray:
    """pack_reads for pre-screened batches: bytes outside uppercase ACGT
    pack as 'A' placeholders. Callers guarantee such windows are never
    counted (the read_id reads path marks them -1 in the rank plane, so the
    kernel treats them as padding — matching the reference's skip of
    N-containing windows, kmer.rs:87-125)."""
    R, L = seqs.shape
    codes = _CODE[seqs]
    codes = np.where(codes == 255, np.uint8(0), codes)
    Lw = words_per_read(L)
    cp = np.zeros((R, Lw * 16), dtype=np.uint32)
    cp[:, :L] = codes
    shifts = (2 * (15 - np.arange(16, dtype=np.uint32))).astype(np.uint32)
    return (cp.reshape(R, Lw, 16) << shifts).sum(axis=2, dtype=np.uint32)
