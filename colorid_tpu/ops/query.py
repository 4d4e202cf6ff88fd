"""Device query kernels: the gather → AND → per-color count hot loop.

This is the TPU-native replacement for the reference's per-k-mer row fetch +
BitVec intersect + bit scan (batch_search_pe.rs:45-83, perfect_search.rs:25-46,
read_id_mt_pe.rs:66-165). The bit-slice matrix lives in device HBM as a dense
uint32 array re-packed into 128-lane blocks (pack_matrix_blocks); a query
arrives either as 2-bit packed k-mers (hashed on device, ops/hash_jax.py)
or as precomputed row indices. One fused jitted call hashes, gathers,
ANDs across the hash axis, unpacks bits and reduces to per-color counts
and coverage statistics — millions of k-mers per dispatch instead of the
reference's one-row-at-a-time pointer chase.

Absent-row semantics: the reference stores only rows with >= 1 set bit and
treats a missing row as "this k-mer cannot be in any color"
(batch_search_pe.rs:51-57 `continue`). Densely, absent == all-zero, and a
k-mer is `valid` iff all of its num_hash rows are nonzero.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_SHIFTS = tuple(range(32))


def _unpack_bits(words: jnp.ndarray) -> jnp.ndarray:
    """uint32 [..., W] -> int32 bits [..., W*32] (LSB-first, color order)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*words.shape[:-1], words.shape[-1] * 32).astype(jnp.int32)


def row_wpad(W: int) -> int:
    """Padded row width in words for a W-word row (pack_matrix_blocks'
    layout): next power of two up to one block, multiples of 128 beyond."""
    if W > 128:
        return 128 * (-(-W // 128))
    return 1 << (max(W, 1) - 1).bit_length()


def pack_matrix_blocks(matrix: np.ndarray) -> tuple[np.ndarray, int]:
    """Re-pack the [R, W] matrix for the block-gather kernel.

    TPU XLA lowers row gathers with sub-tile rows to a serial scalar loop
    (~1M probes/s); gathers of full 128-lane blocks pipeline at ~80M/s. So
    the matrix is stored as [n_blocks, 128] uint32 with the row width padded
    to a power of two (keeping each row's words inside one block). Rows wider
    than one block (> 4096 colors per shard) pad to a multiple of 128 words
    and span q = wpad // 128 consecutive, block-aligned blocks. Returns
    (blocks, wpad).
    """
    R, W = matrix.shape
    wpad = row_wpad(W)
    # rows padded to a multiple of 128 (min 512) so the sorted-stream kernel
    # (ops/stream_query.py) can tile the matrix in up-to-4-tile windows
    n_rows = max(((R * wpad + 128 * 128 - 1) // (128 * 128)) * 128, 512)
    flat = np.zeros(n_rows * 128, dtype=np.uint32)
    if wpad == W:
        flat[: R * W] = np.ascontiguousarray(matrix).reshape(-1)
    else:
        view = flat[: R * wpad].reshape(R, wpad)
        view[:, :W] = matrix
    return flat.reshape(-1, 128), wpad


def _gather_rows(blocks2: jnp.ndarray, rows: jnp.ndarray, wpad: int):
    """vals[n, h, w] = matrix[rows[n, h], w] via fused block-gather +
    one-hot lane select (the TPU-fast replacement for jnp.take on rows)."""
    N, H = rows.shape
    if wpad > 128:
        # wide tier (> 4096 colors): row r owns blocks [r*q, r*q + q), always
        # block-aligned, so the gather is q direct full-block takes with no
        # lane select. Block (not word) addressing keeps indices in int32 for
        # bloom_size * q < 2^31.
        q = wpad // 128
        blk0 = rows.reshape(-1).astype(jnp.int32) * np.int32(q)
        parts = [
            jnp.take(blocks2, blk0 + np.int32(j), axis=0) for j in range(q)
        ]
        return jnp.concatenate(parts, axis=1).reshape(N, H, wpad)
    # block/lane computed from the row index directly (NOT via the word
    # offset rows*wpad, which would overflow int32 for bloom_size * wpad
    # >= 2^31): rpw rows fit one 128-lane block, both powers of two.
    shift = (128 // wpad).bit_length() - 1  # log2(rows per block)
    r = rows.reshape(-1).astype(jnp.int32)  # [P]
    P = r.shape[0]
    n_chunks = 8 if P % 8 == 0 else 1
    lanes = jnp.arange(128, dtype=jnp.int32)[None, :]

    def chunk(carry, rr):
        blk = rr >> shift
        lane = (rr & ((1 << shift) - 1)) * np.int32(wpad)
        b = jnp.take(blocks2, blk, axis=0)  # [CP, 128]
        outs = [
            (b * (lanes == (lane + w)[:, None]).astype(jnp.uint32)).sum(
                axis=1, dtype=jnp.uint32
            )
            for w in range(wpad)
        ]
        return carry, jnp.stack(outs, axis=1)  # [CP, wpad]

    _, vals = jax.lax.scan(chunk, 0, r.reshape(n_chunks, P // n_chunks))
    return vals.reshape(N, H, wpad)


def _gather_rows_blocked(blocks2, rows, wpad: int, rpb: int):
    """Blocked layout: the H rows of a k-mer share one block (ops/blocked.py),
    so one block gather serves all hashes."""
    N, H = rows.shape
    block = (rows[:, 0] // np.int32(rpb)).astype(jnp.int32)  # [N]
    offs = (rows % np.int32(rpb)).astype(jnp.int32)  # [N, H]
    n_chunks = 8 if N % 8 == 0 else 1
    lanes = jnp.arange(128, dtype=jnp.int32)[None, :]

    def chunk(carry, xs):
        blk, off = xs  # [CP], [CP, H]
        b = jnp.take(blocks2, blk, axis=0)  # [CP, 128]
        outs_h = []
        for h in range(H):
            lane0 = off[:, h] * np.int32(wpad)
            outs_h.append(
                jnp.stack(
                    [
                        (
                            b
                            * (lanes == (lane0 + w)[:, None]).astype(jnp.uint32)
                        ).sum(axis=1, dtype=jnp.uint32)
                        for w in range(wpad)
                    ],
                    axis=1,
                )
            )
        return carry, jnp.stack(outs_h, axis=1)  # [CP, H, wpad]

    _, vals = jax.lax.scan(
        chunk,
        0,
        (block.reshape(n_chunks, N // n_chunks),
         offs.reshape(n_chunks, N // n_chunks, H)),
    )
    return vals.reshape(N, H, wpad)


def _gather_rows_bl(blocks2, blk, lane0, wpad: int):
    """Row gather from pre-split (block, lane) int32 pairs — the wide-bloom
    addressing path: a row index beyond int32 (bloom_size >= 2^31) is split
    HOST-side into blk = row // rows_per_block (< 2^31 while bloom_size *
    wpad < 2^38) and lane0 = (row % rows_per_block) * wpad, so no int64
    ever reaches the device."""
    N, H = blk.shape
    b = blk.reshape(-1)
    l0 = lane0.reshape(-1)
    P = b.shape[0]
    n_chunks = 8 if P % 8 == 0 else 1
    lanes = jnp.arange(128, dtype=jnp.int32)[None, :]

    def chunk(carry, xs):
        bb, ll = xs
        bl = jnp.take(blocks2, bb, axis=0)  # [CP, 128]
        outs = [
            (bl * (lanes == (ll + w)[:, None]).astype(jnp.uint32)).sum(
                axis=1, dtype=jnp.uint32
            )
            for w in range(wpad)
        ]
        return carry, jnp.stack(outs, axis=1)

    _, vals = jax.lax.scan(
        chunk, 0,
        (b.reshape(n_chunks, P // n_chunks),
         l0.reshape(n_chunks, P // n_chunks)),
    )
    return vals.reshape(N, H, wpad)


def split_rows_wide(rows: np.ndarray, wpad: int):
    """Host-side split of int64 row indices [N, H] into the (blk, lane0)
    int32 pair _gather_rows_bl expects. Valid while bloom_size * wpad
    < 2^38."""
    rpw = 128 // wpad
    blk = (rows // rpw).astype(np.int32)
    lane0 = ((rows % rpw) * np.int64(wpad)).astype(np.int32)
    return blk, lane0


def _and_present_g(g):
    present = (g != 0).any(axis=2).all(axis=1)
    andw = g[:, 0, :]
    for h in range(1, g.shape[1]):
        andw = andw & g[:, h, :]
    return andw, present


def _and_present(blocks2, rows, wpad: int, rpb: int = 0):
    """AND over the hash axis + row-presence, via the fast gather."""
    if rpb:
        g = _gather_rows_blocked(blocks2, rows, wpad, rpb)
    else:
        g = _gather_rows(blocks2, rows, wpad)  # [N, H, wpad]
    return _and_present_g(g)


@partial(jax.jit, static_argnames=("wpad", "rpb"))
def query_batch(blocks2: jnp.ndarray, rows: jnp.ndarray, mask: jnp.ndarray, *, wpad: int, rpb: int = 0):
    """Score one batch of k-mers against the index.

    Args:
      matrix: uint32 [R, W] bit-slice matrix (device-resident).
      rows: int32 [N, H] Bloom-row indices per k-mer.
      mask: bool [N] real-vs-padding flag (batches are padded to a fixed
        shape so jit compiles once per chunk size).

    Returns:
      counts:     int32 [W*32]  per-color hit counts over valid k-mers
      uniq_color: int32 [N]     color id when the k-mer hit exactly 1 color,
                                else -1 (feeds uniq_freqs coverage stats,
                                batch_search_pe.rs:75-83)
      valid:      bool  [N]     all num_hash rows present (nonzero), real
      and_all:    uint32 [W]    AND of and-words over all valid k-mers
                                (perfect-search global intersection)
      all_valid:  bool  []      every real k-mer had all rows present
    """
    andw, present = _and_present(blocks2, rows, wpad, rpb)
    valid = present & mask
    bits = _unpack_bits(andw)  # [N, C']
    vbits = bits * valid[:, None].astype(jnp.int32)
    counts = vbits.sum(axis=0)
    nhits = vbits.sum(axis=1)
    coloridx = jnp.argmax(vbits, axis=1).astype(jnp.int32)
    uniq_color = jnp.where(valid & (nhits == 1), coloridx, -1)
    # perfect-search global AND: only meaningful when all_valid
    masked = jnp.where(valid[:, None], andw, jnp.uint32(0xFFFFFFFF))
    and_all = jax.lax.reduce(
        masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, dimensions=(0,)
    )
    all_valid = (present | ~mask).all()
    return counts, uniq_color, valid, and_all, all_valid


def _device_blkoff(p_lo, p_hi, k: int, num_hash: int, bloom_size: int,
                   rpb: int, version: int = 1):
    """Blocked placement (ops/blocked.py) from 2-bit packed k-mers: block
    index [N] and per-hash in-block row offsets [N, H]. Versions 1/2 hash
    with on-device XXH3 over the ASCII byte stream; version 3 is
    value-addressed (monotone Lemire block + fmix64 offsets, no XXH3)."""
    from .hash_jax import (
        _limbs_from_packed,
        _mod_barrett,
        _v3_blkoff,
        _xxh3_device,
    )

    if version in (3, 4):
        return _v3_blkoff(p_lo, p_hi, k, num_hash, bloom_size, rpb,
                          version=version)
    limbs = _limbs_from_packed(p_lo, p_hi, k)
    hashes = [_xxh3_device(limbs, k, seed) for seed in range(num_hash)]
    n_blocks = bloom_size // rpb
    block = _mod_barrett(hashes[0], n_blocks).astype(jnp.int32)
    if version == 2:
        grp = rpb // num_hash
        mask_grp = jnp.uint32(grp - 1)
        offs = [(hashes[0][1] & mask_grp).astype(jnp.int32)]
        for i, h in enumerate(hashes[1:], start=1):
            offs.append(np.int32(i * grp) + (h[0] & mask_grp).astype(jnp.int32))
    else:
        mask_rpb = jnp.uint32(rpb - 1)
        offs = [(hashes[0][1] & mask_rpb).astype(jnp.int32)]  # high limb bits
        for h in hashes[1:]:
            offs.append((h[0] & mask_rpb).astype(jnp.int32))  # low limb bits
    return block, offs


def _device_rows(p_lo, p_hi, k: int, num_hash: int, bloom_size: int,
                 rpb: int, version: int = 1):
    """Bloom rows from 2-bit packed k-mers on device: independent XXH3 rows
    (rpb=0) or the blocked placement of ops/blocked.py (rpb>0, power of
    two; version as in blocked_rows_host)."""
    from .hash_jax import _limbs_from_packed, _mod_barrett, _xxh3_device

    if rpb == 0:
        limbs = _limbs_from_packed(p_lo, p_hi, k)
        hashes = [_xxh3_device(limbs, k, seed) for seed in range(num_hash)]
        return jnp.stack(
            [
                _mod_barrett(h, bloom_size).astype(jnp.int32)
                for h in hashes
            ],
            axis=1,
        )
    block, offs = _device_blkoff(p_lo, p_hi, k, num_hash, bloom_size, rpb,
                                 version)
    base = block * np.int32(rpb)
    return jnp.stack([base + o for o in offs], axis=1)


FREQ_CAP = 1024  # per-color on-device frequency histogram width


def _accumulate_one(
    stats, hist, over_col, over_freq, blocks2, rows, mask, qcounts, wpad,
    base_idx, rpb=0, gidx=None,
):
    """qcounts: int32 frequencies clipped to 65535 by the caller. Values
    >= FREQ_CAP route to the overflow list, which records the k-mer's GLOBAL
    index (base_idx + local); the host resolves exact frequencies from its
    own copy, so uint16 host transfer loses nothing."""
    andw, present = _and_present(blocks2, rows, wpad, rpb)
    return _accumulate_tail(
        stats, hist, over_col, over_freq, andw, present, mask, qcounts,
        wpad, base_idx, gidx,
    )


def _accumulate_tail(
    stats, hist, over_col, over_freq, andw, present, mask, qcounts, wpad,
    base_idx, gidx=None,
):
    """Shared epilogue over pre-gathered per-k-mer AND words: counts,
    uniq-hit detection, frequency histogram/overflow, global AND. Split out
    of _accumulate_one so paths that produce the AND words differently
    (e.g. the classic sorted-row stream, ops/stream_query.py) reuse the
    exact accumulation semantics."""
    N = andw.shape[0]
    W = wpad
    C = stats.shape[0] - W - 2
    valid = present & mask
    bits = _unpack_bits(andw)[:, :C]
    vbits = bits * valid[:, None].astype(jnp.int32)
    counts = vbits.sum(axis=0)
    nhits = vbits.sum(axis=1)
    coloridx = jnp.argmax(vbits, axis=1).astype(jnp.int32)
    uniq_mask = valid & (nhits == 1)
    masked = jnp.where(valid[:, None], andw, jnp.uint32(0xFFFFFFFF))
    and_b = jax.lax.reduce(
        masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, dimensions=(0,)
    )
    ok_b = (present | ~mask).all()

    # uniq-hit frequency stats, on device. TPU scatter-add serializes; for
    # narrow color counts a one-hot int8 MXU contraction builds the same
    # histogram ~2x faster (measured; exact).
    small = uniq_mask & (qcounts < FREQ_CAP)
    hist_col = jnp.where(small, coloridx, C)
    qclip = jnp.clip(qcounts, 0, FREQ_CAP - 1)
    if C < 32:
        # joint (color, freq-hi) rows shrink the one-hot operands from
        # CP + FREQ_CAP to CP*HH + 128 lanes (same trick as the stream
        # kernel's in-kernel histogram): delta2[c*HH + hi, lo] counts
        # (color c, freq 128*hi + lo), and the reshape recovers
        # [color, freq] exactly.
        CP, HH = 32, FREQ_CAP // 128
        jcol = hist_col * HH + (qclip >> 7)
        ochi = (jcol[:, None] == jnp.arange(CP * HH, dtype=jnp.int32)
                ).astype(jnp.int8)
        ovlo = ((qclip[:, None] & 127) == jnp.arange(128, dtype=jnp.int32)
                ).astype(jnp.int8)
        delta = jax.lax.dot_general(
            ochi, ovlo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(CP, FREQ_CAP)
        hist = hist + delta[:C]
    elif C < 128:
        CP = 128
        oc = (hist_col[:, None] == jnp.arange(CP, dtype=jnp.int32)).astype(
            jnp.int8
        )
        ov = (qclip[:, None] == jnp.arange(FREQ_CAP, dtype=jnp.int32)).astype(
            jnp.int8
        )
        delta = jax.lax.dot_general(
            oc, ov, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [CP, FREQ_CAP]
        hist = hist + delta[:C]
    else:
        hist = hist.at[hist_col, qclip].add(1, mode="drop")
    big = uniq_mask & (qcounts >= FREQ_CAP)
    n_over_before = stats[C + W + 1]
    capO = over_col.shape[0]
    if gidx is None:
        gidx = jnp.arange(N, dtype=jnp.int32) + base_idx
    n_over_new = big.sum().astype(jnp.int32)

    # the compaction (cumsum + two scatters over N) costs ~half the gather
    # even when nothing overflows; skip it at runtime for the common
    # overflow-free chunk (measured 119 -> ~70ms per 4M k-mers)
    def _route(bufs):
        oc_b, of_b = bufs
        pos = jnp.cumsum(big) - 1
        to = jnp.where(big, n_over_before + pos, capO)
        return (
            oc_b.at[to].set(coloridx, mode="drop"),
            of_b.at[to].set(gidx, mode="drop"),
        )

    over_col, over_freq = jax.lax.cond(
        n_over_new > 0, _route, lambda bufs: bufs, (over_col, over_freq)
    )

    new_counts = stats[:C] + counts
    new_and = (stats[C : C + W].astype(jnp.uint32) & and_b).astype(jnp.int32)
    new_ok = stats[C + W] * ok_b.astype(jnp.int32)
    stats = jnp.concatenate(
        [
            new_counts,
            new_and,
            new_ok[None],
            (n_over_before + n_over_new)[None],
        ]
    )
    return stats, hist, over_col, over_freq


@partial(jax.jit, donate_argnums=(0, 1, 2, 3), static_argnames=("wpad", "chunk", "rpb"))
def query_accumulate_scan(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    rows: jnp.ndarray,  # int32 [n_pad, H], n_pad % chunk == 0
    mask: jnp.ndarray,  # bool [n_pad]
    qcounts: jnp.ndarray,  # uint16 [n_pad], clipped frequencies
    base0: jnp.ndarray,  # int32 [] global index of rows[0]
    *,
    wpad: int,
    chunk: int,
    rpb: int = 0,
):
    """Whole-query accumulation in ONE device call: an internal lax.scan
    walks fixed-size chunks so arbitrarily large k-mer batches cost a single
    dispatch + H2D (dispatch latency and per-call transfer setup dominate on
    a thin host link)."""
    n = rows.shape[0]
    n_chunks = n // chunk
    rows_c = rows.reshape(n_chunks, chunk, rows.shape[1])
    mask_c = mask.reshape(n_chunks, chunk)
    qc_c = qcounts.reshape(n_chunks, chunk)
    bases = base0 + jnp.arange(n_chunks, dtype=jnp.int32) * np.int32(chunk)

    def step(carry, xs):
        stats, hist, over_col, over_freq = carry
        r, m, q, b = xs
        stats, hist, over_col, over_freq = _accumulate_one(
            stats, hist, over_col, over_freq, blocks2, r, m,
            q.astype(jnp.int32), wpad, b, rpb,
        )
        return (stats, hist, over_col, over_freq), 0

    (stats, hist, over_col, over_freq), _ = jax.lax.scan(
        step, (stats, hist, over_col, over_freq), (rows_c, mask_c, qc_c, bases)
    )
    return stats, hist, over_col, over_freq


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=("wpad", "chunk"),
)
def query_accumulate_scan_wide(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    blk: jnp.ndarray,  # int32 [n_pad, H] block index (split_rows_wide)
    lane0: jnp.ndarray,  # int32 [n_pad, H] first lane of the row's words
    mask: jnp.ndarray,  # bool [n_pad]
    qcounts: jnp.ndarray,  # uint16 [n_pad], clipped frequencies
    base0: jnp.ndarray,  # int32 [] global index of blk[0]
    *,
    wpad: int,
    chunk: int,
):
    """query_accumulate_scan for bloom sizes beyond int32 row addressing
    (>= 2^31): the host pre-splits each row into (block, lane) so device
    indices stay int32 — sound while bloom_size * wpad < 2^38. The
    reference accepts any usize bloom size (src/main.rs:475-477,
    src/bigsi.rs:20-27); this keeps that input domain open on TPU."""
    n = blk.shape[0]
    n_chunks = n // chunk
    blk_c = blk.reshape(n_chunks, chunk, blk.shape[1])
    lan_c = lane0.reshape(n_chunks, chunk, lane0.shape[1])
    mask_c = mask.reshape(n_chunks, chunk)
    qc_c = qcounts.reshape(n_chunks, chunk)
    bases = base0 + jnp.arange(n_chunks, dtype=jnp.int32) * np.int32(chunk)

    def step(carry, xs):
        stats, hist, over_col, over_freq = carry
        b, l, m, q, bs = xs
        ap = _and_present_g(_gather_rows_bl(blocks2, b, l, wpad))
        stats, hist, over_col, over_freq = _accumulate_tail(
            stats, hist, over_col, over_freq, ap[0], ap[1], m,
            q.astype(jnp.int32), wpad, bs,
        )
        return (stats, hist, over_col, over_freq), 0

    (stats, hist, over_col, over_freq), _ = jax.lax.scan(
        step, (stats, hist, over_col, over_freq),
        (blk_c, lan_c, mask_c, qc_c, bases),
    )
    return stats, hist, over_col, over_freq


@partial(
    jax.jit,
    static_argnames=("num_reads", "start_sample", "num_colors", "wpad"),
)
def query_readid_batch_wide(
    blocks2: jnp.ndarray,
    blk: jnp.ndarray,  # int32 [N, H]
    lane0: jnp.ndarray,  # int32 [N, H]
    seg_ids: jnp.ndarray,
    kmer_pos: jnp.ndarray,
    *,
    num_reads: int,
    start_sample: int,
    num_colors: int,
    wpad: int,
):
    """query_readid_batch with pre-split wide-bloom addressing."""
    ap = _and_present_g(_gather_rows_bl(blocks2, blk, lane0, wpad))
    return _readid_core(
        blocks2, blk, seg_ids, kmer_pos,
        num_reads=num_reads, start_sample=start_sample,
        num_colors=num_colors, wpad=wpad, ap=ap,
    )


@partial(
    jax.jit,
    static_argnames=("num_reads", "start_sample", "num_colors", "wpad"),
)
def query_readid_firsthit_wide(
    blocks2: jnp.ndarray,
    blk: jnp.ndarray,
    lane0: jnp.ndarray,
    seg_ids: jnp.ndarray,
    kmer_pos: jnp.ndarray,
    *,
    num_reads: int,
    start_sample: int,
    num_colors: int,
    wpad: int,
):
    """query_readid_firsthit with pre-split wide-bloom addressing."""
    ap = _and_present_g(_gather_rows_bl(blocks2, blk, lane0, wpad))
    return _readid_firsthit_core(
        blocks2, blk, seg_ids, kmer_pos,
        num_reads=num_reads, start_sample=start_sample,
        num_colors=num_colors, wpad=wpad, ap=ap,
    )


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=("wpad", "chunk", "k", "num_hash", "bloom_size", "rpb",
                     "bv"),
)
def query_accumulate_hash_scan(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    packed: jnp.ndarray,  # uint32 [n_pad, 2] 2-bit packed canonical k-mers
    qcounts: jnp.ndarray,  # uint16 [n_pad], clipped; 0 marks padding
    base0: jnp.ndarray,  # int32 [] global index of packed[0]
    *,
    wpad: int,
    chunk: int,
    k: int,
    num_hash: int,
    bloom_size: int,
    rpb: int = 0,
    bv: int = 1,
):
    """Fully fused streaming query: device-side XXH3 (ops/hash_jax.py) +
    gather/AND/count accumulation, one dispatch per segment. The host ships
    only 10 bytes per k-mer (8B packed k-mer + 2B clipped frequency)."""
    n = packed.shape[0]
    n_chunks = n // chunk
    p_c = packed.reshape(n_chunks, chunk, 2)
    qc_c = qcounts.reshape(n_chunks, chunk)
    bases = base0 + jnp.arange(n_chunks, dtype=jnp.int32) * np.int32(chunk)

    def step(carry, xs):
        stats, hist, over_col, over_freq = carry
        p, q, b = xs
        rows = _device_rows(p[:, 0], p[:, 1], k, num_hash, bloom_size, rpb,
                            bv)
        q32 = q.astype(jnp.int32)
        mask = q32 > 0
        stats, hist, over_col, over_freq = _accumulate_one(
            stats, hist, over_col, over_freq, blocks2, rows, mask, q32, wpad,
            b, rpb,
        )
        return (stats, hist, over_col, over_freq), 0

    (stats, hist, over_col, over_freq), _ = jax.lax.scan(
        step, (stats, hist, over_col, over_freq), (p_c, qc_c, bases)
    )
    return stats, hist, over_col, over_freq


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=("wpad", "chunk", "k", "num_hash", "bloom_size", "rpb",
                     "bv"),
)
def query_accumulate_hash_scan_exact(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    packed: jnp.ndarray,  # uint32 [n_pad, 2] 2-bit packed canonical k-mers
    qcounts: jnp.ndarray,  # int32 [n_pad] EXACT frequencies; 0 marks padding
    *,
    wpad: int,
    chunk: int,
    k: int,
    num_hash: int,
    bloom_size: int,
    rpb: int = 0,
    bv: int = 1,
):
    """query_accumulate_hash_scan for device-resident queries (ops/extract.py
    counted the k-mers on device, so frequencies are exact int32 and never
    crossed the host link): overflow slots (freq >= FREQ_CAP) record the
    frequency itself instead of a global k-mer index, since no host-side
    copy exists to resolve it from."""
    n = packed.shape[0]
    n_chunks = n // chunk
    p_c = packed.reshape(n_chunks, chunk, 2)
    qc_c = qcounts.reshape(n_chunks, chunk)

    def step(carry, xs):
        stats, hist, over_col, over_freq = carry
        p, q = xs
        rows = _device_rows(p[:, 0], p[:, 1], k, num_hash, bloom_size, rpb,
                            bv)
        mask = q > 0
        stats, hist, over_col, over_freq = _accumulate_one(
            stats, hist, over_col, over_freq, blocks2, rows, mask, q, wpad,
            jnp.int32(0), rpb, gidx=q,
        )
        return (stats, hist, over_col, over_freq), 0

    (stats, hist, over_col, over_freq), _ = jax.lax.scan(
        step, (stats, hist, over_col, over_freq), (p_c, qc_c)
    )
    return stats, hist, over_col, over_freq


PAD_POS = np.int32(2**30)  # kmer_pos for padding slots: never counted


def _decode_ranks(ranks):
    """Rank-plane decode for the reads-path kernels: int16 uses -1 as the
    no-rank marker; uint8 (the halved-H2D encoding, read_id.py) uses 255.
    Returns (rank int32, live bool)."""
    rk = ranks.astype(jnp.int32)
    if ranks.dtype == jnp.uint8:
        return rk, rk != 255
    return rk, rk >= 0


@partial(jax.jit, static_argnames=("num_reads", "start_sample", "num_colors", "wpad", "rpb"))
def query_readid_batch(
    blocks2: jnp.ndarray,
    rows: jnp.ndarray,
    seg_ids: jnp.ndarray,
    kmer_pos: jnp.ndarray,
    *,
    num_reads: int,
    start_sample: int,
    num_colors: int,
    wpad: int,
    rpb: int = 0,
):
    """Per-read hit-count matrix for the read classifier (read_id).

    Replicates search_index / search_index_classic (read_id_mt_pe.rs:66-165)
    over a flattened batch of reads:

    - k-mers of all reads are concatenated; ``seg_ids`` maps each k-mer to
      its read, ``kmer_pos`` is its insertion-order position within the read.
    - a k-mer with any absent row makes the read count one ``no_hits``
      pseudo-color AND stops counting for every later k-mer of that read
      (the reference `break`s out of the k-mer loop).
    - with start_sample B > 0, k-mers at positions >= B only count toward
      colors already hit by the first B k-mers (the candidate set).

    Args:
      matrix: uint32 [R, W].
      rows: int32 [N, H] row indices of all k-mers in the batch.
      seg_ids: int32 [N] read index per k-mer (sorted ascending).
      kmer_pos: int32 [N] position of the k-mer within its read's set.
      num_reads: static int, number of reads B_r.
      start_sample: the -B bitvector_sample parameter (0 = classic).
      num_colors: real color count C (pseudo-color no_hits uses index C).

    Returns:
      report: int32 [B_r, C+1] per-read per-color counts; column C is the
        no_hits pseudo-color.
    """
    return _readid_core(
        blocks2, rows, seg_ids, kmer_pos,
        num_reads=num_reads, start_sample=start_sample,
        num_colors=num_colors, wpad=wpad, rpb=rpb,
    )


def _readid_core(
    blocks2, rows, seg_ids, kmer_pos, *, num_reads, start_sample,
    num_colors, wpad, rpb=0, ap=None,
):
    n_reads = num_reads
    andw, present_all = (
        ap if ap is not None else _and_present(blocks2, rows, wpad, rpb)
    )
    valid = present_all
    bits = _unpack_bits(andw)[:, :num_colors]  # [N, C]

    # first absent k-mer position per read (or +inf)
    BIG = jnp.int32(2**30)
    absent_pos = jnp.where(valid, BIG, kmer_pos)
    first_absent = (
        jnp.full((n_reads,), BIG, dtype=jnp.int32)
        .at[seg_ids]
        .min(absent_pos)
    )
    fa = first_absent[seg_ids]
    counted = valid & (kmer_pos < fa)  # strictly before the break point
    had_absent = first_absent < BIG  # read counts one no_hits

    cbits = bits * counted[:, None].astype(jnp.int32)
    if start_sample > 0:
        phase1 = cbits * (kmer_pos < start_sample)[:, None].astype(jnp.int32)
        cand = (
            jnp.zeros((n_reads, num_colors), dtype=jnp.int32)
            .at[seg_ids]
            .max(phase1)
        )  # candidate set: colors hit in first B k-mers
        phase2 = cbits * (kmer_pos >= start_sample)[:, None].astype(jnp.int32)
        contrib = phase1 + phase2 * cand[seg_ids]
    else:
        contrib = cbits
    report = (
        jnp.zeros((n_reads, num_colors), dtype=jnp.int32)
        .at[seg_ids]
        .add(contrib)
    )
    no_hits = had_absent.astype(jnp.int32)[:, None]
    return jnp.concatenate([report, no_hits], axis=1)


@partial(jax.jit, static_argnames=("num_reads", "start_sample", "num_colors", "wpad", "rpb"))
def query_readid_firsthit(
    blocks2: jnp.ndarray,
    rows: jnp.ndarray,
    seg_ids: jnp.ndarray,
    kmer_pos: jnp.ndarray,
    *,
    num_reads: int,
    start_sample: int,
    num_colors: int,
    wpad: int,
    rpb: int = 0,
):
    """First-hit k-mer position per (read, color) — the insertion order of
    the reference's ``final_report`` FnvHashMap (read_id_mt_pe.rs:127-139:
    colors enter the map at their first phase-1/classic hit, ascending color
    within one k-mer; ``no_hits`` enters at the break). Column C carries the
    first-absent position. 2**30 where never hit. Used by the read_id tie
    fixup to reconstruct kmer_poll_plus's stable-sort order for tied top
    hits (read_id_mt_pe.rs:195-196)."""
    return _readid_firsthit_core(
        blocks2, rows, seg_ids, kmer_pos,
        num_reads=num_reads, start_sample=start_sample,
        num_colors=num_colors, wpad=wpad, rpb=rpb,
    )


def _readid_firsthit_core(
    blocks2, rows, seg_ids, kmer_pos, *, num_reads, start_sample,
    num_colors, wpad, rpb=0, ap=None,
):
    andw, present_all = (
        ap if ap is not None else _and_present(blocks2, rows, wpad, rpb)
    )
    valid = present_all
    bits = _unpack_bits(andw)[:, :num_colors]
    BIG = jnp.int32(2**30)
    absent_pos = jnp.where(valid, BIG, kmer_pos)
    first_absent = (
        jnp.full((num_reads,), BIG, dtype=jnp.int32).at[seg_ids].min(absent_pos)
    )
    fa = first_absent[seg_ids]
    counted = valid & (kmer_pos < fa)
    if start_sample > 0:
        # only phase-1 hits insert report keys (phase 2 increments existing)
        ph1 = counted & (kmer_pos < start_sample)
    else:
        ph1 = counted
    pos_hit = jnp.where(
        (bits > 0) & ph1[:, None], kmer_pos[:, None], BIG
    )
    fh = (
        jnp.full((num_reads, num_colors), BIG, dtype=jnp.int32)
        .at[seg_ids]
        .min(pos_hit)
    )
    return jnp.concatenate([fh, first_absent[:, None]], axis=1)


@partial(
    jax.jit,
    static_argnames=(
        "num_reads", "start_sample", "num_colors", "wpad", "k", "num_hash",
        "bloom_size", "rpb", "bv",
    ),
)
def query_readid_hash_batch(
    blocks2: jnp.ndarray,
    packed: jnp.ndarray,  # uint32 [N, 2] 2-bit packed canonical k-mers
    seg_ids16: jnp.ndarray,  # int16 [N]
    kmer_pos16: jnp.ndarray,  # int16 [N]; -1 marks padding
    *,
    num_reads: int,
    start_sample: int,
    num_colors: int,
    wpad: int,
    k: int,
    num_hash: int,
    bloom_size: int,
    rpb: int = 0,
    bv: int = 1,
):
    """query_readid_batch with on-device XXH3: the host ships 12B per k-mer
    (packed key + int16 seg/pos) instead of 24B."""
    from .hash_jax import _limbs_from_packed

    rows = _device_rows(packed[:, 0], packed[:, 1], k, num_hash, bloom_size,
                        rpb, bv)
    seg_ids = seg_ids16.astype(jnp.int32)
    p16 = kmer_pos16.astype(jnp.int32)
    kmer_pos = jnp.where(p16 < 0, jnp.int32(PAD_POS), p16)
    return _readid_core(
        blocks2, rows, seg_ids, kmer_pos,
        num_reads=num_reads, start_sample=start_sample,
        num_colors=num_colors, wpad=wpad, rpb=rpb,
    )


def pad_rows(rows: np.ndarray, n_pad: int) -> np.ndarray:
    """Pad a row-index batch to a fixed shape with index 0 (harmless: padding
    is excluded via seg_ids/valid masks by callers)."""
    if rows.shape[0] == n_pad:
        return rows
    out = np.zeros((n_pad, rows.shape[1]), dtype=rows.dtype)
    out[: rows.shape[0]] = rows
    return out


@partial(
    jax.jit,
    static_argnames=(
        "num_reads", "start_sample", "num_colors", "wpad", "k", "L",
        "num_hash", "bloom_size", "rpb", "bv",
    ),
)
def query_readid_reads_batch(
    blocks2: jnp.ndarray,
    mates_packed: jnp.ndarray,  # uint32 [M, ceil(L/16)] 2-bit mate words
    mate_seg16: jnp.ndarray,  # int16 [M] read id per mate (-1 = padding)
    lens: jnp.ndarray,  # int32 [M] true mate lengths
    ranks16: jnp.ndarray,  # int16 (-1 = none) or uint8 (255 = none)
    #                        [M, L-k+1] per-window set rank plane
    *,
    num_reads: int,
    start_sample: int,
    num_colors: int,
    wpad: int,
    k: int,
    L: int,
    num_hash: int,
    bloom_size: int,
    rpb: int = 0,
    bv: int = 1,
):
    """query_readid_batch where the device re-derives every canonical k-mer
    window from 2-bit packed mates (ops/extract.py machinery): the host
    ships ~0.25 B per base plus a 2-byte rank plane per window instead of
    12 B per unique k-mer (native ct_read_rank_windows computes the ranks —
    the FnvHashSet iteration order the break/-B logic needs — and marks
    duplicate/skipped windows -1, which become kernel padding here)."""
    from .extract import _unpack_codes, _window_limbs

    M = mates_packed.shape[0]
    NW = L - k + 1
    codes = _unpack_codes(mates_packed, L)
    lo, hi = _window_limbs(codes, k, NW)  # [M, NW]
    w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
    in_len = w_idx + k <= lens[:, None]
    rk, rk_live = _decode_ranks(ranks16)
    live = in_len & rk_live & (mate_seg16 >= 0)[:, None]
    pos = jnp.where(live, rk, jnp.int32(PAD_POS)).reshape(-1)
    seg = jnp.maximum(mate_seg16.astype(jnp.int32), 0)
    seg = jnp.broadcast_to(seg[:, None], (M, NW)).reshape(-1)
    rows = _device_rows(
        lo.reshape(-1), hi.reshape(-1), k, num_hash, bloom_size, rpb, bv
    )
    return _readid_core(
        blocks2, rows, seg, pos,
        num_reads=num_reads, start_sample=start_sample,
        num_colors=num_colors, wpad=wpad, rpb=rpb,
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_reads", "num_colors", "wpad", "k", "L", "nm", "d",
        "num_hash", "bloom_size", "rpb", "bv",
    ),
)
def query_readid_orderfree_reads(
    blocks2: jnp.ndarray,
    mates_packed: jnp.ndarray,  # uint32 [M, ceil(L/16)]; M = num_reads * nm
    lens: jnp.ndarray,  # int32 [M] true mate lengths
    valid_bits: jnp.ndarray,  # uint32 [M, ceil(L/32)] per-base validity
    *,
    num_reads: int,
    num_colors: int,
    wpad: int,
    k: int,
    L: int,
    nm: int,  # mates per read (uniform)
    d: int,
    num_hash: int,
    bloom_size: int,
    rpb: int = 0,
    bv: int = 1,
):
    """ORDER-FREE read classifier pass: full per-read per-color counts with
    no break-on-absent and no -B candidate phase, plus the facts that decide
    whether the exact set-order replay is needed at all.

    The reference's per-read result depends on FnvHashSet iteration order
    only through (a) the break at the first absent k-mer
    (read_id_mt_pe.rs:88-89) and (b) the first-B candidate set
    (read_id_mt_pe.rs:115-139). A color hit in phase 1 receives its FULL
    count; a color not hit in phase 1 receives none. The host-side safety
    test (pipelines/read_id.py::_resolve_orderfree) decides from this
    pass's outputs whether ANY iteration order could change the outcome;
    only the reads that fail it replay the exact hashbrown order.

    The per-read k-mer SET is recovered on device: canonical windows sort
    within each read (any order dedups a set) and duplicate windows are
    masked out.

    Returns int32 [num_reads, C + 3]: columns 0..C-1 = full counts,
    column C = 1 if any distinct k-mer had an absent row, column C+1 = D
    (distinct valid k-mer count), column C+2 = number of distinct k-mers
    whose rows are all present but whose AND hits no color (these can make
    the first-B candidate set empty under some orders).
    """
    from .extract import _unpack_codes, _window_limbs, _window_valid_ok

    M = mates_packed.shape[0]
    NW = L - k + 1
    codes = _unpack_codes(mates_packed, L)
    lo, hi = _window_limbs(codes, k, NW)  # [M, NW]
    w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
    valid = w_idx + k <= lens[:, None]
    if d > 1:
        valid = valid & (w_idx % d == 0)
    valid = valid & _window_valid_ok(valid_bits, L, k, NW)
    SENT = jnp.uint32(0xFFFFFFFF)  # > any canonical key
    WR = nm * NW  # windows per read
    lo = jnp.where(valid, lo, SENT).reshape(num_reads, WR)
    hi = jnp.where(valid, hi, SENT).reshape(num_reads, WR)
    s_hi, s_lo = jax.lax.sort((hi, lo), dimension=1, num_keys=2)
    first = jnp.concatenate(
        [
            jnp.ones((num_reads, 1), dtype=bool),
            (s_hi[:, 1:] != s_hi[:, :-1]) | (s_lo[:, 1:] != s_lo[:, :-1]),
        ],
        axis=1,
    )
    uniq = first & ~((s_hi == SENT) & (s_lo == SENT))
    D = uniq.sum(axis=1).astype(jnp.int32)

    rows = _device_rows(
        s_lo.reshape(-1), s_hi.reshape(-1), k, num_hash, bloom_size, rpb, bv
    )
    andw, present = _and_present(blocks2, rows, wpad, rpb)
    u = uniq.reshape(-1)
    counted = u & present
    bits = _unpack_bits(andw)[:, :num_colors]
    cbits = bits * counted[:, None].astype(jnp.int32)
    # windows are contiguous per read: a reshape-reduce replaces the
    # (TPU-serializing) segment scatter-add
    report = cbits.reshape(num_reads, WR, num_colors).sum(axis=1)
    absent = (u & ~present).reshape(num_reads, WR).any(axis=1)
    zerohit = (counted & (bits.sum(axis=1) == 0)).reshape(
        num_reads, WR
    ).sum(axis=1).astype(jnp.int32)
    return jnp.concatenate(
        [
            report,
            absent.astype(jnp.int32)[:, None],
            D[:, None],
            zerohit[:, None],
        ],
        axis=1,
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_reads", "start_sample", "num_colors", "wpad", "k", "L",
        "num_hash", "bloom_size", "rpb", "bv",
    ),
)
def query_readid_firsthit_reads(
    blocks2: jnp.ndarray,
    mates_packed: jnp.ndarray,  # uint32 [M, ceil(L/16)]
    mate_seg16: jnp.ndarray,  # int16 [M]; -1 = padding
    lens: jnp.ndarray,  # int32 [M]
    ranks16: jnp.ndarray,  # int16 [M, L-k+1]
    *,
    num_reads: int,
    start_sample: int,
    num_colors: int,
    wpad: int,
    k: int,
    L: int,
    num_hash: int,
    bloom_size: int,
    rpb: int = 0,
    bv: int = 1,
):
    """query_readid_firsthit with device-side window extraction (the
    reads-path twin of query_readid_reads_batch) — feeds the read_id
    tie-order fixup without any host k-mer work."""
    from .extract import _unpack_codes, _window_limbs

    M = mates_packed.shape[0]
    NW = L - k + 1
    codes = _unpack_codes(mates_packed, L)
    lo, hi = _window_limbs(codes, k, NW)
    w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
    in_len = w_idx + k <= lens[:, None]
    rk, rk_live = _decode_ranks(ranks16)
    live = in_len & rk_live & (mate_seg16 >= 0)[:, None]
    pos = jnp.where(live, rk, jnp.int32(PAD_POS)).reshape(-1)
    seg = jnp.maximum(mate_seg16.astype(jnp.int32), 0)
    seg = jnp.broadcast_to(seg[:, None], (M, NW)).reshape(-1)
    rows = _device_rows(
        lo.reshape(-1), hi.reshape(-1), k, num_hash, bloom_size, rpb, bv
    )
    return _readid_firsthit_core(
        blocks2, rows, seg, pos,
        num_reads=num_reads, start_sample=start_sample,
        num_colors=num_colors, wpad=wpad, rpb=rpb,
    )
