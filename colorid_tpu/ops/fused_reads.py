"""Fused reads→results search for value-addressed (v3/v4) blocked indexes.

One jitted device call covers the whole query pipeline the reference runs
host-side plus its search loop (batch_search_pe.rs:28-93): 2-bit packed
reads stream in, canonical k-mer windows come out of the packed words,
ONE sort by k-mer value groups duplicates for exact counting (clean_map's
strictly-greater filter, kmer.rs:826-837) AND — because the v3 layout's
block address is monotone in the k-mer value (ops/blocked.py) — leaves the
probe stream in matrix-block order for the sorted-stream Pallas kernel
(ops/stream_query.py). No compaction scatters, no host round-trip between
counting and querying: the only D2H is the final O(colors) accumulator
fetch plus two scalars (n_unique, n_dropped).

Compared to the unfused path (ops/extract.py extract_count -> n_unique
sync -> query_accumulate_hash_scan_exact), this removes the [N, 2]
compaction scatter (~4 s for 48M windows on v5e — the round-2 bench
bottleneck), the mid-pipeline sync, and the per-probe XXH3 (v3 uses one
fmix64), and replaces the per-probe one-hot block gather with the
2-tile-window MXU kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .extract import _unpack_codes, _window_limbs
from .hash_jax import _v3_blkoff
from .stream_query import PC, _stream_core, pack_offsets

U32 = jnp.uint32
SENT = U32(0xFFFFFFFF)


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=(
        "k", "L", "filter_t", "d", "wpad", "num_hash", "bloom_size", "rpb",
        "n_colors", "bv",
    ),
)
def fused_search_reads(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,  # uint32 [Rb, 128] packed matrix
    blocks_bp: jnp.ndarray,  # int8 [Rb, 512] byte planes
    reads_packed: jnp.ndarray,  # uint32 [R, ceil(L/16)] 2-bit read words
    lens: jnp.ndarray,  # int32 [R]
    valid_bits: jnp.ndarray | None = None,  # uint32 [R, ceil(L/32)] or None
    *,
    k: int,
    L: int,
    filter_t: int,
    d: int,
    wpad: int,
    num_hash: int,
    bloom_size: int,
    rpb: int,
    n_colors: int,
    bv: int = 3,
):
    """Same donated stats/hist/overflow contract as stream_accumulate_hash,
    in exact mode (overflow slots record the frequency itself). Returns
    (stats, hist, over_col, over_freq, n_dropped, n_unique)."""
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
        from .extract import _window_valid_ok

        valid = valid & _window_valid_ok(valid_bits, L, k, NW)
    lo = jnp.where(valid, lo, SENT).reshape(-1)
    hi = jnp.where(valid, hi, SENT).reshape(-1)
    N = R * NW
    # pairwise compaction rounds (below): each round halves the slot count,
    # so pad the stream so the final length stays a multiple of PC
    rounds = min(3, (filter_t + 1).bit_length() - 1) if filter_t >= 1 else 0
    pad = (-N) % (PC << rounds)
    if pad:
        lo = jnp.concatenate([lo, jnp.full(pad, SENT)])
        hi = jnp.concatenate([hi, jnp.full(pad, SENT)])
    P = N + pad
    # ONE sort: k-mer-value order == block order (v3 monotone addressing)
    s_hi, s_lo = jax.lax.sort((hi, lo), num_keys=2)
    iota = jnp.arange(P, dtype=jnp.int32)
    new = (iota == 0) | (s_hi != jnp.roll(s_hi, 1)) | (s_lo != jnp.roll(s_lo, 1))
    starts = jnp.where(new, iota, np.int32(P))
    suffix_min = jax.lax.cummin(starts, axis=0, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), P, dtype=jnp.int32)]
    )
    count = next_start - iota
    keep = new & ~((s_hi == SENT) & (s_lo == SENT)) & (count > filter_t)
    n_unique = keep.sum().astype(jnp.int32)
    qc = jnp.where(keep, count, 0)

    # pairwise compaction: for filter_t >= 1 every kept group start is
    # followed by >= filter_t more identical slots, so two kept starts are
    # always > filter_t slots apart — a pair of adjacent slots holds at most
    # ONE kept probe, and each round halves the stream with a pure
    # elementwise select (no sort, no scatter). Round r is sound while
    # 2^r <= filter_t+1 (spacing of kept starts after r-1 halvings). The
    # filler value of a keptless pair is the even slot's real sorted value,
    # keeping the block stream monotone for the kernel's tile windows.
    for _ in range(rounds):
        half = s_lo.shape[0] // 2
        k2 = keep.reshape(half, 2)
        pick = k2[:, 1]
        s_lo2 = s_lo.reshape(half, 2)
        s_hi2 = s_hi.reshape(half, 2)
        qc2 = qc.reshape(half, 2)
        s_lo = jnp.where(pick, s_lo2[:, 1], s_lo2[:, 0])
        s_hi = jnp.where(pick, s_hi2[:, 1], s_hi2[:, 0])
        qc = jnp.where(pick, qc2[:, 1], qc2[:, 0])
        keep = k2[:, 0] | k2[:, 1]

    blk, offs = _v3_blkoff(s_lo, s_hi, k, num_hash, bloom_size, rpb,
                           version=bv)
    offp = pack_offsets(offs)
    stats, hist, over_col, over_freq, n_drop = _stream_core(
        stats, hist, over_col, over_freq, blocks2, blocks_bp,
        blk, offp, qc, qc,  # exact mode: overflow payload = the frequency
        wpad=wpad, num_hash=num_hash, rpb=rpb, n_colors=n_colors,
    )
    return stats, hist, over_col, over_freq, n_drop, n_unique


# ---------------------------------------------------------------------------
# chunked fused pipeline: no dispatch spans more than one read chunk's
# windows. Single 48M-window fused dispatches wedge the device link
# (observed 2026-08-20/21: the RPC never returns while 24M-window programs
# run in seconds), so large read sets split into chunks that each run
# extract+sort+count (A), compact their unique k-mers with a second sort
# (A2 — a scatter compaction costs seconds at this scale, a key sort does
# not), and ONE merge dispatch (B) re-sorts the concatenated compacted
# streams, sums duplicate counts ACROSS chunks, applies the global
# strictly-greater frequency filter (kmer.rs:826-837 — per-chunk filtering
# would drop k-mers whose occurrences straddle chunks), and feeds the
# sorted-stream kernel.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "L", "d"))
def extract_sorted_counts(
    reads_packed: jnp.ndarray,
    lens: jnp.ndarray,
    valid_bits: jnp.ndarray | None = None,
    *,
    k: int,
    L: int,
    d: int,
):
    """Dispatch A of the chunked fused pipeline: canonical windows of one
    read chunk, value-sorted, with per-group counts at group starts (qc ==
    0 elsewhere / for SENT). NO frequency filter — counts are per-chunk
    partials. Returns (s_lo, s_hi, qc, n_unique)."""
    R = reads_packed.shape[0]
    NW = L - k + 1
    codes = _unpack_codes(reads_packed, L)
    lo, hi = _window_limbs(codes, k, NW)
    w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
    valid = w_idx + k <= lens[:, None]
    if d > 1:
        valid = valid & (w_idx % d == 0)
    if valid_bits is not None:
        from .extract import _window_valid_ok

        valid = valid & _window_valid_ok(valid_bits, L, k, NW)
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
    qc = jnp.where(keep, count, 0)
    return s_lo, s_hi, qc, keep.sum().astype(jnp.int32)


@partial(jax.jit, static_argnames=("cap",))
def compact_sorted(s_lo, s_hi, qc, *, cap: int):
    """Dispatch A2: push the unique entries (qc > 0) to the front with a
    3-key sort (liveness, then key — the stream stays key-sorted) and slice
    the first ``cap``. Callers size cap from dispatch A's n_unique."""
    dead = (qc == 0).astype(jnp.uint32)
    _, hi2, lo2, qc2 = jax.lax.sort((dead, s_hi, s_lo, qc), num_keys=3)
    return lo2[:cap], hi2[:cap], qc2[:cap]


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=(
        "k", "filter_t", "wpad", "num_hash", "bloom_size", "rpb",
        "n_colors", "bv",
    ),
)
def fused_merge_query(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    blocks_bp: jnp.ndarray,
    lo_c: jnp.ndarray,  # uint32 [S, CAP] compacted per-chunk streams
    hi_c: jnp.ndarray,
    qc_c: jnp.ndarray,  # int32 [S, CAP] per-chunk partial counts (0 = dead)
    *,
    k: int,
    filter_t: int,
    wpad: int,
    num_hash: int,
    bloom_size: int,
    rpb: int,
    n_colors: int,
    bv: int = 4,
):
    """Dispatch B: merge-sort the chunk streams, sum per-k-mer counts
    across chunks, apply the GLOBAL strictly-greater filter, and run the
    sorted-stream kernel. Same contract as fused_search_reads; the total
    probe count is S*CAP (<< the window count)."""
    P = lo_c.size
    pad = (-P) % PC
    lo = lo_c.reshape(-1)
    hi = hi_c.reshape(-1)
    qc = qc_c.reshape(-1)
    if pad:
        lo = jnp.concatenate([lo, jnp.full(pad, SENT)])
        hi = jnp.concatenate([hi, jnp.full(pad, SENT)])
        qc = jnp.concatenate([qc, jnp.zeros(pad, dtype=jnp.int32)])
    P += pad
    s_hi, s_lo, s_qc = jax.lax.sort((hi, lo, qc), num_keys=2)
    iota = jnp.arange(P, dtype=jnp.int32)
    new = (iota == 0) | (s_hi != jnp.roll(s_hi, 1)) | (s_lo != jnp.roll(s_lo, 1))
    starts = jnp.where(new, iota, np.int32(P))
    suffix_min = jax.lax.cummin(starts, axis=0, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), P, dtype=jnp.int32)]
    )
    # int32 prefix sums suffice: the grand total is the window count of the
    # whole read set, capped below 2^31 by search_reads' n_windows guard
    cs = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int32), jnp.cumsum(s_qc)]
    )
    total = cs[next_start] - cs[iota]
    keep = (
        new
        & ~((s_hi == SENT) & (s_lo == SENT))
        & (total > filter_t)
        & (total > 0)  # dead-only groups never count
    )
    n_unique = keep.sum().astype(jnp.int32)
    qcm = jnp.where(keep, total, 0)
    blk, offs = _v3_blkoff(s_lo, s_hi, k, num_hash, bloom_size, rpb,
                           version=bv)
    offp = pack_offsets(offs)
    stats, hist, over_col, over_freq, n_drop = _stream_core(
        stats, hist, over_col, over_freq, blocks2, blocks_bp,
        blk, offp, qcm, qcm,
        wpad=wpad, num_hash=num_hash, rpb=rpb, n_colors=n_colors,
    )
    return stats, hist, over_col, over_freq, n_drop, n_unique
