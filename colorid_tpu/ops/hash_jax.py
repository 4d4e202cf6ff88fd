"""Device-side XXH3-64: hash canonical k-mers into Bloom rows on the TPU.

The host ships each canonical k-mer as its 2-bit packing (8 bytes) instead
of row indices (4 bytes x num_hash) — halving H2D traffic — and the
vectorized hash runs on the VPU fused into the query kernel (the
"multi-hashing as vectorized kernels over packed 2-bit batches" of the
design brief).

TPU JAX has no 64-bit integers here, so u64 values are (lo, hi) uint32 limb
pairs and the 64x64→128 multiply-fold is schoolbook over 16-bit halves. All
secret-derived constants are precomputed per seed on host (they are
scalars), so the kernel is pure input-dependent VPU arithmetic.

Supported: k in 4..32 (the 4-8, 9-16 and 17-128 XXH3 length classes over
ASCII ACGT bytes; k<=3 indexes don't occur in practice), bloom_size < 2^30
(the 2-bit Horner modulo keeps intermediates in uint32). Callers fall back
to host hashing outside this envelope.

Validated bit-exact against hashing/xxh3.py (itself validated against the
reference C implementation) in tests/test_hash_jax.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hashing.xxh3 import KSECRET, M64, P64_1, PMX1, PMX2, _rd64

U32 = jnp.uint32
_M16 = np.uint32(0xFFFF)


def _c(x: int) -> tuple[np.uint32, np.uint32]:
    """Split a python u64 constant into (lo, hi) uint32."""
    x &= M64
    return np.uint32(x & 0xFFFFFFFF), np.uint32(x >> 32)


# -- 64-bit ops over (lo, hi) uint32 limb pairs -----------------------------


def _xor64(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def _add64(a, b):
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(U32)
    return lo, a[1] + b[1] + carry


def _shr64(a, n: int):
    lo, hi = a
    if n == 0:
        return a
    if n < 32:
        return (lo >> U32(n)) | (hi << U32(32 - n)), hi >> U32(n)
    if n == 32:
        return hi, jnp.zeros_like(hi)
    return hi >> U32(n - 32), jnp.zeros_like(hi)


def _shl64(a, n: int):
    lo, hi = a
    if n == 0:
        return a
    if n < 32:
        return lo << U32(n), (hi << U32(n)) | (lo >> U32(32 - n))
    if n == 32:
        return jnp.zeros_like(lo), lo
    return jnp.zeros_like(lo), lo << U32(n - 32)


def _rotl64(a, n: int):
    return _or64(_shl64(a, n), _shr64(a, 64 - n))


def _or64(a, b):
    return a[0] | b[0], a[1] | b[1]


def _mul32(a, b):
    """Full 32x32 -> 64 product of uint32 arrays, as (lo, hi)."""
    ah = a >> U32(16)
    al = a & _M16
    bh = b >> U32(16)
    bl = b & _M16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> U32(16)) + (lh & _M16) + (hl & _M16)
    lo = (ll & _M16) | (mid << U32(16))
    hi = hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))
    return lo, hi


def _mul64_fold(a, b):
    """(a * b) 128-bit product folded to 64 bits (lo ^ hi of the product)."""
    alo, ahi = a
    blo, bhi = b
    p0l, p0h = _mul32(alo, blo)  # bits 0..63
    p1l, p1h = _mul32(alo, bhi)  # << 32
    p2l, p2h = _mul32(ahi, blo)  # << 32
    p3l, p3h = _mul32(ahi, bhi)  # << 64
    # product limbs w0..w3 (32 bits each)
    w0 = p0l
    s1 = p0h + p1l
    c1 = (s1 < p0h).astype(U32)
    w1 = s1 + p2l
    c1 = c1 + (w1 < s1).astype(U32)
    s2 = p1h + p2h
    c2 = (s2 < p1h).astype(U32)
    s2b = s2 + p3l
    c2 = c2 + (s2b < s2).astype(U32)
    w2 = s2b + c1
    c2 = c2 + (w2 < s2b).astype(U32)
    w3 = p3h + c2
    return w0 ^ w2, w1 ^ w3


def _avalanche_xxh3(h):
    h = _xor64(h, _shr64(h, 37))
    h = _mul64_fold_low(h, _c(PMX1))
    h = _xor64(h, _shr64(h, 32))
    return h


def _mul64_fold_low(a, const):
    """Low 64 bits of a * const (const as numpy (lo, hi) pair)."""
    alo, ahi = a
    blo = jnp.full_like(alo, const[0])
    bhi = jnp.full_like(ahi, const[1])
    p0l, p0h = _mul32(alo, blo)
    p1l, _ = _mul32(alo, bhi)
    p2l, _ = _mul32(ahi, blo)
    return p0l, p0h + p1l + p2l


def _avalanche_xxh64(h):
    from ..hashing.xxh3 import P64_2, P64_3

    h = _xor64(h, _shr64(h, 33))
    h = _mul64_fold_low(h, _c(P64_2))
    h = _xor64(h, _shr64(h, 29))
    h = _mul64_fold_low(h, _c(P64_3))
    h = _xor64(h, _shr64(h, 32))
    return h


def _rrmxmx(h, length: int):
    h = _xor64(h, _xor64(_rotl64(h, 49), _rotl64(h, 24)))
    h = _mul64_fold_low(h, _c(PMX2))
    plus = _add64(_shr64(h, 35), (np.uint32(length), np.uint32(0)))
    h = _xor64(h, plus)
    h = _mul64_fold_low(h, _c(PMX2))
    h = _xor64(h, _shr64(h, 28))
    return h


# -- byte assembly ----------------------------------------------------------

_ASCII = np.array([65, 67, 71, 84], dtype=np.uint32)  # A C G T


def _limbs_from_packed(lo: jnp.ndarray, hi: jnp.ndarray, k: int) -> list:
    """ASCII byte stream of the k-mer as uint32 little-endian limbs.

    The 2-bit packing puts base 0 at bits [2k-2, 2k-1] of the 64-bit value
    (native ingest layout). Returns ceil(k/4) uint32 arrays.
    """
    lut = jnp.asarray(_ASCII)
    limbs = []
    for j in range((k + 3) // 4):
        limb = jnp.zeros_like(lo)
        for b in range(4):
            i = j * 4 + b  # byte index in the ASCII string
            if i >= k:
                break
            shift = 2 * (k - 1 - i)
            if shift >= 32:
                code = (hi >> U32(shift - 32)) & U32(3)
            elif shift > 0:
                code = ((lo >> U32(shift)) | (hi << U32(32 - shift))) & U32(3)
            else:
                code = lo & U32(3)
            limb = limb | (lut[code] << U32(8 * b))
        limbs.append(limb)
    return limbs


def _rd64_limbs(limbs: list, off: int, k: int):
    """Little-endian u64 read at byte offset `off` from the limb stream."""

    def byte(i):  # uint32 array with byte i of the stream in bits 0..7
        return (limbs[i // 4] >> U32(8 * (i % 4))) & U32(0xFF)

    lo = jnp.zeros_like(limbs[0])
    hi = jnp.zeros_like(limbs[0])
    for b in range(4):
        lo = lo | (byte(off + b) << U32(8 * b))
    for b in range(4):
        hi = hi | (byte(off + 4 + b) << U32(8 * b))
    return lo, hi


def _rd32_limbs(limbs: list, off: int):
    def byte(i):
        return (limbs[i // 4] >> U32(8 * (i % 4))) & U32(0xFF)

    v = jnp.zeros_like(limbs[0])
    for b in range(4):
        v = v | (byte(off + b) << U32(8 * b))
    return v


# -- the hash ----------------------------------------------------------------


def _mix16(limbs, off: int, sec_off: int, seed: int, k: int):
    in_lo = _rd64_limbs(limbs, off, k)
    in_hi = _rd64_limbs(limbs, off + 8, k)
    cl = _c((_rd64(KSECRET, sec_off) + seed) & M64)
    ch = _c((_rd64(KSECRET, sec_off + 8) - seed) & M64)
    a = _xor64(in_lo, (jnp.full_like(limbs[0], cl[0]), jnp.full_like(limbs[0], cl[1])))
    b = _xor64(in_hi, (jnp.full_like(limbs[0], ch[0]), jnp.full_like(limbs[0], ch[1])))
    return _mul64_fold(a, b)


def _xxh3_device(limbs: list, k: int, seed: int):
    """XXH3-64(ascii_kmer, seed) for fixed length k, one seed."""
    if 17 <= k <= 32:
        acc = (jnp.full_like(limbs[0], _c((k * P64_1) & M64)[0]),
               jnp.full_like(limbs[0], _c((k * P64_1) & M64)[1]))
        acc = _add64(acc, _mix16(limbs, 0, 0, seed, k))
        acc = _add64(acc, _mix16(limbs, k - 16, 16, seed, k))
        return _avalanche_xxh3(acc)
    if 9 <= k <= 16:
        f1 = _c(((_rd64(KSECRET, 24) ^ _rd64(KSECRET, 32)) + seed) & M64)
        f2 = _c(((_rd64(KSECRET, 40) ^ _rd64(KSECRET, 48)) - seed) & M64)
        in_lo = _xor64(
            _rd64_limbs(limbs, 0, k),
            (jnp.full_like(limbs[0], f1[0]), jnp.full_like(limbs[0], f1[1])),
        )
        in_hi = _xor64(
            _rd64_limbs(limbs, k - 8, k),
            (jnp.full_like(limbs[0], f2[0]), jnp.full_like(limbs[0], f2[1])),
        )
        swapped = _bswap64(in_lo)
        acc = _add64((np.uint32(k), np.uint32(0)), swapped)
        acc = _add64(acc, in_hi)
        acc = _add64(acc, _mul64_fold(in_lo, in_hi))
        return _avalanche_xxh3(acc)
    if 4 <= k <= 8:
        seed2 = (seed ^ ((int.from_bytes((seed & 0xFFFFFFFF).to_bytes(4, "little"), "big")) << 32)) & M64
        flip = _c(((_rd64(KSECRET, 8) ^ _rd64(KSECRET, 16)) - seed2) & M64)
        in1 = _rd32_limbs(limbs, 0)
        in2 = _rd32_limbs(limbs, k - 4)
        in64 = (in2, in1)  # in2 + (in1 << 32)
        keyed = _xor64(in64, (jnp.full_like(in1, flip[0]), jnp.full_like(in1, flip[1])))
        return _rrmxmx(keyed, k)
    raise ValueError(f"device xxh3 supports k in 4..32, got {k}")


def _bswap64(a):
    lo, hi = a

    def bswap32(x):
        return (
            ((x & U32(0xFF)) << U32(24))
            | ((x & U32(0xFF00)) << U32(8))
            | ((x >> U32(8)) & U32(0xFF00))
            | (x >> U32(24))
        )

    return bswap32(hi), bswap32(lo)


def _mod_horner(h, m: int):
    """(hi*2^32 + lo) mod m for m < 2^30, via 2-bit Horner digits.

    Reference implementation; _mod_barrett is the fast path."""
    lo, hi = h
    mm = np.uint32(m)
    r = jnp.zeros_like(lo)
    for word in (hi, lo):
        for d in range(15, -1, -1):
            digit = (word >> U32(2 * d)) & U32(3)
            r = (r << U32(2)) | digit  # < 4m <= 2^32
            r = r - mm * (r >= mm).astype(U32)
            r = r - mm * (r >= mm).astype(U32)
            r = r - mm * (r >= mm).astype(U32)
    return r


def _mul64_full(a, b_const: tuple[np.uint32, np.uint32]):
    """Full 128-bit product limbs (w0..w3) of a 64-bit array x constant."""
    alo, ahi = a
    blo = jnp.full_like(alo, b_const[0])
    bhi = jnp.full_like(ahi, b_const[1])
    p0l, p0h = _mul32(alo, blo)
    p1l, p1h = _mul32(alo, bhi)
    p2l, p2h = _mul32(ahi, blo)
    p3l, p3h = _mul32(ahi, bhi)
    w0 = p0l
    s1 = p0h + p1l
    c1 = (s1 < p0h).astype(U32)
    w1 = s1 + p2l
    c1 = c1 + (w1 < s1).astype(U32)
    s2 = p1h + p2h
    c2 = (s2 < p1h).astype(U32)
    s2b = s2 + p3l
    c2 = c2 + (s2b < s2).astype(U32)
    w2 = s2b + c1
    c2 = c2 + (w2 < s2b).astype(U32)
    w3 = p3h + c2
    return w0, w1, w2, w3


def _mod_barrett(h, m: int):
    """h mod m for m < 2^31 via Barrett reduction.

    m < 2^30: R = floor(2^63/m); q = (h*R) >> 63 underestimates h/m by < 2,
    so r = h - q*m < 4m < 2^32 fits uint32 and needs at most 3 conditional
    subtracts.

    2^30 <= m < 2^31 (the int32 device block-addressing limit): R =
    floor(2^64/m) < 2^34 still fits 64 bits; q = high 64 bits of h*R
    underestimates h/m by < 3, so the remainder needs 64-bit conditional
    subtracts (r < 4m can exceed 2^32) before the final value (< m < 2^31)
    collapses to the low limb."""
    if m < 2**30:
        R = (1 << 63) // m
        w0, w1, w2, w3 = _mul64_full(h, _c(R))
        # q = product >> 63 (take bits 63.. of the 128-bit product)
        q_lo = (w1 >> U32(31)) | (w2 << U32(1))
        q_hi = (w2 >> U32(31)) | (w3 << U32(1))
        # r = h - q*m (low 64 bits); r < 4m < 2^32 so the low limb suffices
        qm = _mul64_fold_low((q_lo, q_hi), _c(m))
        r = h[0] - qm[0]
        mm = np.uint32(m)
        r = r - mm * (r >= mm).astype(U32)
        r = r - mm * (r >= mm).astype(U32)
        r = r - mm * (r >= mm).astype(U32)
        return r
    if m >= 2**31:
        raise ValueError("device modulo supports m < 2^31")
    R = (1 << 64) // m
    w0, w1, w2, w3 = _mul64_full(h, _c(R))
    q = (w2, w3)  # product >> 64
    qm = _mul64_fold_low(q, _c(m))
    # r = h - q*m in 64-bit limbs; 0 <= r < 4m < 2^33
    r_lo = h[0] - qm[0]
    borrow = (r_lo > h[0]).astype(U32)
    r_hi = h[1] - qm[1] - borrow
    mm = np.uint32(m)
    for _ in range(3):
        ge = (r_hi > U32(0)) | (r_lo >= mm)
        sub = mm * ge.astype(U32)
        new_lo = r_lo - sub
        r_hi = r_hi - (new_lo > r_lo).astype(U32) * ge.astype(U32)
        r_lo = new_lo
    return r_lo


# -- v3 (value-addressed) blocked placement ----------------------------------

_FMIX_C1 = 0xFF51AFD7ED558CCD
_FMIX_C2 = 0xC4CEB9FE1A85EC53


def _fmix64_device(v):
    """murmur3 fmix64 over (lo, hi) uint32 limb pairs (ops/blocked.py
    fmix64's device twin; ~20 VPU ops vs ~2000 for seeded XXH3)."""
    v = _xor64(v, _shr64(v, 33))
    v = _mul64_fold_low(v, _c(_FMIX_C1))
    v = _xor64(v, _shr64(v, 33))
    v = _mul64_fold_low(v, _c(_FMIX_C2))
    v = _xor64(v, _shr64(v, 33))
    return v


def _sqr64_hi(a):
    """High 64 bits of the 128-bit square of a 64-bit (lo, hi) limb pair.

    a^2 = p0 + (p1 << 33) + (p3 << 64) with p0 = lo^2, p1 = lo*hi,
    p3 = hi^2; the shifted-p1 limbs are l1..l3 and carries propagate
    limbwise into (w2, w3)."""
    alo, ahi = a
    p0l, p0h = _mul32(alo, alo)
    p1l, p1h = _mul32(alo, ahi)
    p3l, p3h = _mul32(ahi, ahi)
    l1 = p1l << U32(1)
    l2 = (p1h << U32(1)) | (p1l >> U32(31))
    l3 = p1h >> U32(31)
    w1 = p0h + l1
    c1 = (w1 < p0h).astype(U32)  # carry out of limb 1
    t = l2 + p3l
    c2 = (t < l2).astype(U32)
    w2 = t + c1
    c2 = c2 + (w2 < t).astype(U32)
    w3 = l3 + p3h + c2
    return w2, w3


def _v3_blkoff(lo, hi, k: int, num_hash: int, bloom_size: int, rpb: int,
               version: int = 3):
    """Value-addressed blocked placement from 2-bit packed k-mers, on
    device: block int32 [N] (MONOTONE in the (hi, lo) value) + per-hash
    in-block offsets int32 [N, H]. Twin of ops/blocked.py::
    v3_block_offsets. version 4 routes the value through the canonical CDF
    F(x) = 1-(1-x)^2 for uniform block loads (ops/blocked.py docstring)."""
    n_blocks = bloom_size // rpb
    grp = rpb // num_hash
    g_bits = grp.bit_length() - 1
    x = _shl64((lo, hi), 64 - 2 * k)
    if version == 4:
        y = (~x[0], ~x[1])
        s2, s3 = _sqr64_hi(y)
        x = (~s2, ~s3)
    _, _, w2, _ = _mul64_full(x, _c(n_blocks))  # (x * nb) >> 64 < nb < 2^31
    block = w2.astype(jnp.int32)
    m = _fmix64_device((lo, hi))
    gm = U32(grp - 1)
    offs = [
        (np.int32(h * grp)
         + (_shr64(m, g_bits * h)[0] & gm).astype(jnp.int32))
        for h in range(num_hash)
    ]
    return block, offs


@partial(jax.jit, static_argnames=("k", "num_hash", "bloom_size"))
def bloom_rows_device(
    packed: jnp.ndarray, *, k: int, num_hash: int, bloom_size: int
) -> jnp.ndarray:
    """packed [N, 2] uint32 (lo, hi) 2-bit k-mers -> rows [N, num_hash] int32."""
    lo = packed[:, 0]
    hi = packed[:, 1]
    limbs = _limbs_from_packed(lo, hi, k)
    outs = []
    for seed in range(num_hash):
        h = _xxh3_device(limbs, k, seed)
        outs.append(_mod_barrett(h, bloom_size).astype(jnp.int32))
    return jnp.stack(outs, axis=1)


def pack_keys_host(keys: np.ndarray) -> np.ndarray | None:
    """ASCII canonical k-mers [N, k] -> (lo, hi) uint32 [N, 2], or None when
    any byte is outside uppercase ACGT (caller uses host hashing then)."""
    n, k = keys.shape
    if k > 32:
        return None
    code = np.full(256, 255, dtype=np.uint8)
    code[ord("A")] = 0
    code[ord("C")] = 1
    code[ord("G")] = 2
    code[ord("T")] = 3
    c = code[keys]
    if (c == 255).any():
        return None
    val = np.zeros(n, dtype=np.uint64)
    for i in range(k):
        val = (val << np.uint64(2)) | c[:, i].astype(np.uint64)
    out = np.empty((n, 2), dtype=np.uint32)
    out[:, 0] = (val & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, 1] = (val >> np.uint64(32)).astype(np.uint32)
    return out
