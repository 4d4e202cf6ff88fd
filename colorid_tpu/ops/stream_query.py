"""Sorted-stream Pallas query kernel for blocked-v2 (split-lane) indexes.

The generic query path gathers one random 512-byte block per k-mer through
XLA's row gather (~80M blocks/s on v5e, ~5% of HBM bandwidth). This module
replaces the gather for large query batches with a bandwidth-shaped plan:

1. hash on device (ops/hash_jax.py) -> block index + per-hash lane offsets,
2. sort the probes by block index (payload: offsets, clipped frequency,
   global k-mer index),
3. a Pallas kernel walks fixed chunks of PC sorted probes; a
   scalar-prefetched tile index selects a 2-tile (2 x 128 blocks) VMEM
   window per chunk. Consecutive chunks reuse the window (the pipeline
   elides copies when the block index is unchanged), so the matrix streams
   HBM->VMEM at most twice per segment regardless of probe count.
4. inside the kernel the gather is a one-hot bf16 MXU contraction (no
   dynamic indexing), the H words of each k-mer come out of a second fixed
   0/1-matrix contraction (possible because the v2 layout confines hash h
   to its own lane group -- a split-block Bloom filter), and the whole
   epilogue (AND across hashes, presence, per-color counts, uniq-hit
   detection, the [C, FREQ_CAP] frequency histogram) accumulates in VMEM.

Sorting reorders k-mers, which is sound because every accumulated statistic
(counts, histogram, global AND, overflow multiset keyed by global index) is
permutation-invariant; the rare out-of-window probes (possible only at low
probe density) are re-run exactly through the generic gather path
(`_residual_pass`).

Replicates batch_search_pe.rs:45-83 semantics (per-k-mer row AND, per-color
counts, uniq_freqs) like ops/query.py::query_accumulate_hash_scan, with
identical stats/hist/overflow contracts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .query import FREQ_CAP, _accumulate_one, _device_blkoff

T = 128  # matrix tile rows (512-byte blocks) per window half
PC = 1024  # probes per grid step
RES_CAP = 8192  # out-of-window probes re-run via the generic path
OVER_CAP = 1 << 15  # uniq-hit frequency-overflow entries per segment


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def byte_plane_blocks(blocks2: jnp.ndarray) -> jnp.ndarray:
    """[Rb, 128] uint32 -> bf16 [Rb, 512] byte planes (col 128*p + lane =
    byte p of the word at lane). Bytes are <= 255, exactly representable in
    bf16, so the kernel's one-hot MXU gather needs no in-kernel conversion.
    Built on device from the resident u32 matrix (no extra host transfer)."""
    planes = [
        ((blocks2 >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(jnp.int32)
        for p in range(4)
    ]
    return jnp.concatenate(planes, axis=1).astype(jnp.float32).astype(
        jnp.bfloat16
    )


def _g_matrix(num_hash: int, wpad: int) -> np.ndarray:
    """[512, 128] 0/1 extraction matrix: col 4*(h*wpad+w)+p sums the lanes
    of hash-group h, word w, byte-plane p (exactly one lane is nonzero after
    masking, so the f32 accumulation is exact)."""
    G = np.zeros((512, 128), dtype=np.float32)
    grp = (128 // wpad) // num_hash
    for p in range(4):
        for h in range(num_hash):
            for w in range(wpad):
                for r in range(grp):
                    lane = (h * grp + r) * wpad + w
                    G[128 * p + lane, 4 * (h * wpad + w) + p] = 1.0
    return G


def _stream_kernel(
    tb_ref, blk_ref, off_ref, qc_ref, tileA_ref, tileB_ref, g_ref,
    uniq_ref, counts_ref, hist_ref, misc_ref,
    counts_scratch,
    *, num_hash, wpad, n_colors, cp, n_chunks,
):
    H = num_hash
    cols = 32 * wpad
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        counts_scratch[:] = jnp.zeros_like(counts_scratch)
        hist_ref[:] = jnp.zeros_like(hist_ref)
        misc_ref[:] = jnp.full_like(misc_ref, -1)

    base = tb_ref[j] * T
    l2 = (blk_ref[:] - base)[:, None]  # i32 [PC, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (PC, T), 1)
    ohA = ((l2 == iota) & (l2 < T)).astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)
    ohB = (((l2 - T) == iota) & (l2 >= T)).astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)
    # tiles are pre-converted bf16 byte planes (byte_plane_blocks): the
    # gather is one MXU contraction per tile, no in-kernel conversions
    g = jax.lax.dot_general(
        ohA, tileA_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = g + jax.lax.dot_general(
        ohB, tileB_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [PC, 512] byte planes
    lanes512 = jax.lax.broadcasted_iota(jnp.int32, (PC, 512), 1) & 127
    o2 = off_ref[:][:, None]  # u32 [PC, 1], 8 bits per hash (in-block row)
    sel = None
    for h in range(H):
        off_h = ((o2 >> (8 * h)) & jnp.uint32(0xFF)).astype(jnp.int32)
        lane_lo = off_h * wpad
        m = (lanes512 >= lane_lo) & (lanes512 < lane_lo + wpad)
        sel = m if sel is None else (sel | m)
    masked = jnp.where(sel, g, 0.0).astype(jnp.bfloat16)  # [PC, 512]
    words2 = jax.lax.dot_general(
        masked, g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [PC, 128]; col 4*(h*wpad+w)+p = byte-plane p of hash h's word w
    wi = words2.astype(jnp.int32)
    # recombine planes with multiplies (Mosaic miscompiles shifts on these
    # narrow lane slices; x * 2^s is equivalent and compiles correctly)
    valid = None
    andws = [None] * wpad
    for h in range(H):
        pres_h = None
        for w in range(wpad):
            i = 4 * (h * wpad + w)
            word = (
                wi[:, i]
                + wi[:, i + 1] * 256
                + wi[:, i + 2] * 65536
                + wi[:, i + 3] * 16777216
            )
            andws[w] = word if h == 0 else (andws[w] & word)
            nz = word != 0
            pres_h = nz if pres_h is None else (pres_h | nz)
        valid = pres_h if h == 0 else (valid & pres_h)

    qc = qc_ref[:].astype(jnp.int32)  # [PC]; 0 marks padding
    realm = qc > 0
    vmask = valid & realm
    vm32 = vmask.astype(jnp.int32)[:, None]  # [PC, 1]

    # unpack and-bits -> [PC, 32*wpad], accumulate counts in a PC-shaped
    # scratch (single add per chunk; reduced once at the last step)
    bit_iota = jax.lax.broadcasted_iota(jnp.int32, (PC, 32), 1)
    bcols = []
    for w in range(wpad):
        bw = (andws[w][:, None] >> bit_iota) & 1
        bcols.append(bw)
    B = jnp.concatenate(bcols, axis=1) if wpad > 1 else bcols[0]
    vbits = B * vm32
    counts_scratch[:] = counts_scratch[:] + vbits

    nhits = jnp.sum(vbits, axis=1)  # [PC]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (PC, cols), 1)
    colorsum = jnp.sum(vbits * col_iota, axis=1)  # == color id when nhits==1
    uniq = vmask & (nhits == 1)
    uniq_ref[:] = jnp.where(uniq, colorsum, -1)

    # uniq-hit frequency histogram: one-hot MXU contraction, accumulated in
    # the output buffer (constant index map -> single VMEM accumulator)
    qclip = jnp.clip(qc, 0, FREQ_CAP - 1)
    small = uniq & (qc < FREQ_CAP)
    hist_col = jnp.where(small, colorsum, n_colors)[:, None]
    oc = (hist_col == jax.lax.broadcasted_iota(jnp.int32, (PC, cp), 1)
          ).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    ov = (qclip[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (PC, FREQ_CAP), 1)
    ).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    delta = jax.lax.dot_general(
        oc, ov, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [cp, FREQ_CAP]
    hist_ref[:] = hist_ref[:] + delta.astype(jnp.int32)

    # global AND / all-valid accumulators (rows: wpad and-words, then ok)
    for w in range(wpad):
        misc_ref[w, :] = misc_ref[w, :] & jnp.where(vmask, andws[w], -1)
    misc_ref[wpad, :] = misc_ref[wpad, :] & (valid | ~realm).astype(jnp.int32)

    @pl.when(j == n_chunks - 1)
    def _final():
        counts_ref[0, :] = jnp.sum(counts_scratch[:], axis=0)


def _misc_rows(wpad: int) -> int:
    return ((wpad + 1 + 7) // 8) * 8


@partial(
    jax.jit,
    static_argnames=("num_hash", "wpad", "n_colors", "cp"),
)
def _stream_call(blocks_bp, gmat, blk_s, off_s, qc_s, tb, *, num_hash, wpad,
                 n_colors, cp):
    P = blk_s.shape[0]
    n_chunks = P // PC
    mr = _misc_rows(wpad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((T, 512), lambda j, tb: (tb[j], 0)),
            pl.BlockSpec((T, 512), lambda j, tb: (tb[j] + 1, 0)),
            pl.BlockSpec((512, 128), lambda j, tb: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((8, 32 * wpad), lambda j, tb: (0, 0)),
            pl.BlockSpec((cp, FREQ_CAP), lambda j, tb: (0, 0)),
            pl.BlockSpec((mr, PC), lambda j, tb: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((PC, 32 * wpad), jnp.int32),
        ],
    )
    return pl.pallas_call(
        partial(
            _stream_kernel,
            num_hash=num_hash,
            wpad=wpad,
            n_colors=n_colors,
            cp=cp,
            n_chunks=n_chunks,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((P,), jnp.int32),  # uniq color (-1: none)
            jax.ShapeDtypeStruct((8, 32 * wpad), jnp.int32),  # counts row 0
            jax.ShapeDtypeStruct((cp, FREQ_CAP), jnp.int32),  # histogram
            jax.ShapeDtypeStruct((mr, PC), jnp.int32),  # and/ok accumulators
        ),
        interpret=_interpret(),
    )(tb, blk_s, off_s, qc_s, blocks_bp, blocks_bp, gmat)


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=("wpad", "k", "num_hash", "bloom_size", "rpb",
                     "n_colors"),
)
def stream_accumulate_hash(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    blocks_bp: jnp.ndarray,  # bf16 [Rb, 512] from byte_plane_blocks
    gmat: jnp.ndarray,  # bf16 [512, 128] from _g_matrix
    packed: jnp.ndarray,  # uint32 [P, 2]; P % PC == 0
    qcounts: jnp.ndarray,  # uint16 [P] clipped frequencies; 0 marks padding
    base0: jnp.ndarray,  # int32 [] global index of packed[0]
    *,
    wpad: int,
    k: int,
    num_hash: int,
    bloom_size: int,
    rpb: int,
    n_colors: int,
):
    """Drop-in replacement for query_accumulate_hash_scan on blocked-v2
    indexes: same donated stats/hist/overflow contract, one device call per
    segment. stats gains nothing new except that slot C+wpad+1 (n_over) is
    followed by the same layout; an extra guard counter is returned
    separately (n_dropped) — nonzero means the segment must be re-run on the
    generic path (overflow/residual capacity exceeded; effectively never)."""
    from .hash_jax import _limbs_from_packed

    P = packed.shape[0]
    C = n_colors
    cp = 32 if C < 32 else 128
    n_tiles = blocks2.shape[0] // T

    limbs = _limbs_from_packed(packed[:, 0], packed[:, 1], k)
    blk, offs = _device_blkoff(limbs, k, num_hash, bloom_size, rpb, True)
    offp = offs[0].astype(jnp.uint32)
    for h in range(1, num_hash):
        offp = offp | (offs[h].astype(jnp.uint32) << jnp.uint32(8 * h))
    qc32 = qcounts.astype(jnp.int32)
    gidx = base0 + jnp.arange(P, dtype=jnp.int32)

    blk_s, off_s, qc_s, gidx_s = jax.lax.sort(
        (blk, offp, qc32, gidx), num_keys=1
    )
    n_chunks = P // PC
    firsts = blk_s.reshape(n_chunks, PC)[:, 0]
    tb = jnp.clip(firsts // T, 0, n_tiles - 2).astype(jnp.int32)
    inwin = (
        blk_s.reshape(n_chunks, PC) - tb[:, None] * T < 2 * T
    ).reshape(-1)

    uniq, counts_out, hist_out, misc = _stream_call(
        blocks_bp, gmat, blk_s, off_s,
        jnp.where(inwin, qc_s, 0),
        tb, num_hash=num_hash, wpad=wpad, n_colors=C, cp=cp,
    )

    # merge the kernel accumulators into the running stats
    counts_new = stats[:C] + counts_out[0, :C]
    and_rows = misc[:wpad]  # [wpad, P] i32; -1 where not counted
    and_b = jax.lax.reduce(
        and_rows.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF),
        jax.lax.bitwise_and, dimensions=(1,),
    )
    ok_b = jnp.min(misc[wpad]) & 1
    hist = hist + hist_out[:C]

    # uniq-hit frequency overflow entries (freq >= FREQ_CAP): compacted and
    # appended at the running n_over offset; the host resolves exact
    # frequencies from the recorded global k-mer index.
    n_over_before = stats[C + wpad + 1]
    big = (uniq >= 0) & (qc_s >= FREQ_CAP)
    n_big = jnp.sum(big.astype(jnp.int32))
    capO = over_col.shape[0]

    # both fixups (overflow compaction, out-of-window residual) cost a
    # cumsum/scatter over all P probes; lax.cond skips them at runtime in
    # the common case where nothing overflows / everything is in-window
    def _route_over(bufs):
        oc_b, of_b = bufs
        bidx = jnp.nonzero(big, size=OVER_CAP, fill_value=P)[0]
        bvalid = bidx < P
        pos = jnp.arange(OVER_CAP, dtype=jnp.int32)
        to = jnp.where(bvalid, n_over_before + pos, capO)
        safe = jnp.minimum(bidx, P - 1)
        return (
            oc_b.at[to].set(uniq[safe], mode="drop"),
            of_b.at[to].set(gidx_s[safe], mode="drop"),
        )

    over_col, over_freq = jax.lax.cond(
        n_big > 0, _route_over, lambda bufs: bufs, (over_col, over_freq)
    )
    n_drop_over = jnp.maximum(n_big - OVER_CAP, 0)

    # residual pass: probes outside their chunk's 2-tile window (possible
    # only at low probe density) re-run through the generic gather
    res = (~inwin) & (qc_s > 0)
    n_res = jnp.sum(res.astype(jnp.int32))
    stats_mid = jnp.concatenate(
        [
            counts_new,
            and_b.astype(jnp.int32),
            (stats[C + wpad] * ok_b)[None],
            jnp.minimum(n_over_before + n_big, n_over_before + OVER_CAP)[None],
        ]
    )

    def _residual(args):
        stats_m, hist_m, oc_b, of_b = args
        ridx = jnp.nonzero(res, size=RES_CAP, fill_value=P)[0]
        rvalid = ridx < P
        rsafe = jnp.minimum(ridx, P - 1)
        rblk = blk_s[rsafe]
        roff = off_s[rsafe]
        rows_res = jnp.stack(
            [
                rblk * np.int32(rpb)
                + ((roff >> jnp.uint32(8 * h)) & jnp.uint32(0xFF)).astype(
                    jnp.int32
                )
                for h in range(num_hash)
            ],
            axis=1,
        )
        return _accumulate_one(
            stats_m, hist_m, oc_b, of_b, blocks2, rows_res, rvalid,
            qc_s[rsafe] * rvalid, wpad, jnp.int32(0), rpb,
            gidx=gidx_s[rsafe],
        )

    stats_f, hist_f, over_col, over_freq = jax.lax.cond(
        n_res > 0,
        _residual,
        lambda args: args,
        (stats_mid, hist, over_col, over_freq),
    )
    n_drop_res = jnp.maximum(n_res - RES_CAP, 0)
    return stats_f, hist_f, over_col, over_freq, n_drop_over + n_drop_res
