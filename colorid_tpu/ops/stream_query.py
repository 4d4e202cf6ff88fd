"""Sorted-stream Pallas query kernel for blocked-v2 (split-lane) indexes.

The generic query path gathers one random 512-byte block per k-mer through
XLA's row gather (~75M blocks/s on v5e, ~6% of HBM bandwidth). This module
replaces the gather for large query batches with a bandwidth-shaped plan:

1. hash on device (ops/hash_jax.py) -> block index + per-hash lane offsets,
2. sort the probes by block index (payload: offsets, clipped frequency,
   global k-mer index),
3. a Pallas kernel walks fixed chunks of PC sorted probes; a
   scalar-prefetched tile index selects a 2-tile (2 x 128 blocks) VMEM
   window per chunk. Consecutive chunks reuse the window (the pipeline
   elides copies when the block index is unchanged), so the matrix streams
   HBM->VMEM at most twice per segment regardless of probe count.
4. inside the kernel the block gather is an int8 one-hot MXU contraction
   over byte planes (no dynamic row indexing), the H words of each k-mer
   come out of per-vreg lane gathers (take_along_axis -> tpu.dynamic_gather;
   possible because the v2 layout confines hash h to its own lane group --
   a split-block Bloom filter), AND/presence reduce via constant-pattern
   lane-gather trees, and the whole epilogue (per-color counts, uniq-hit
   detection, the [C, HIST_W] frequency histogram) accumulates in VMEM.

Sorting reorders k-mers, which is sound because every accumulated statistic
(counts, histogram, global AND, overflow multiset keyed by global index) is
permutation-invariant; the rare out-of-window probes (possible only at low
probe density) are re-run exactly through the generic gather path
(`_residual_pass`). Uniq-hit frequencies >= HIST_W bypass the in-kernel
histogram through the exact overflow list (the host resolves them from the
recorded global k-mer index), so narrowing the kernel histogram loses
nothing.

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

import os as _os

T = 128  # matrix tile rows (512-byte blocks)
# probes per grid step. The kernel is grid-overhead-bound (~17us/chunk vs
# ~6us of VPU/MXU work at 2048), so larger chunks amortize the overhead —
# bounded by VMEM ([PC, 128*planes] i32 gather accumulator) and by the
# window span (more probes per chunk span more matrix blocks). Read once at
# import; COLORID_STREAM_PC overrides for sweeps.
PC = int(_os.environ.get("COLORID_STREAM_PC", "2048"))
HIST_W = 256  # in-kernel uniq-hit histogram width for WIDE color counts
RES_CAP = 256 * PC  # residual probe slots (overflow-append bound)
OVER_CAP = 1 << 18  # uniq-hit frequency-overflow entries per segment


def _nt_win(wpad: int) -> int:
    """Tiles per chunk window. Narrow-color kernels widen to 4 tiles (512
    blocks) so genome value coldspots leave only a handful of residual
    chunks (measured 2026-08-21 at bench density: 253k residual probes in
    426 chunks with 2 tiles vs 27k in 26 with 4). Wide-color kernels are
    epilogue/VMEM-bound and regress with the extra per-chunk tile copies
    (512-color steady-state 13.4 -> 9.0 M k-mers/s measured), so they
    keep 2 tiles and lean on the larger residual chunk budget."""
    return 4 if wpad <= 4 else 2


def _nch(wpad: int) -> int:
    """Residual chunk capacity (out-of-window probes re-run through the
    generic gather at CHUNK granularity: jnp.nonzero over the [n_chunks]
    has-residual flags costs microseconds, where a probe-granular nonzero
    over 10M probes hid a ~50ms sort). Narrower windows leave more
    residual chunks, so the wide-color budget doubles."""
    return 128 if wpad <= 4 else 256


def _hist_w(n_colors: int) -> int:
    """In-kernel uniq-hit frequency histogram width. For narrow color
    counts the [cp, hw] VMEM block is cheap, so the kernel histogram
    covers the engine's full FREQ_CAP range and the frequency-overflow
    path (a ~50ms probe-granular compaction) never fires for frequencies
    < 1024; wide color counts keep the narrower block."""
    return 1024 if n_colors < 128 else HIST_W

# sum over byte planes of the +128 de-offset corrections: 128 * (1 + 256 +
# 65536 + 16777216) = 0x80808080, as an int32 bit pattern
_DEOFFSET = np.int32(np.uint32(0x80808080).astype(np.int64) - (1 << 32))

# Clipped-frequency bits packed into the sort key (sort diet): carrying
# min(freq, 2^QKEY_BITS - 1) in the key's low bits drops one payload array
# from the pre-kernel sort (measured ~10ms per 10M-probe dispatch on v5e).
# Sound because within-block probe order is irrelevant (the kernel window is
# chosen per chunk) and every consumer of the frequency either needs it only
# below FREQ_CAP (the histogram/overflow routing) or gets the exact value
# from the overflow payload (gidx in clipped mode, the frequency itself in
# exact mode when the caller guarantees max < 2^QKEY_BITS).
QKEY_BITS = 11
QKEY_MASK = (1 << QKEY_BITS) - 1


def _qc_in_key_ok(bloom_size: int, rpb: int) -> bool:
    """Static guard: the block index must fit the key's high bits."""
    n_blocks = (bloom_size + rpb - 1) // rpb
    return n_blocks <= (1 << (32 - QKEY_BITS))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def byte_plane_blocks(blocks2: jnp.ndarray) -> jnp.ndarray:
    """[Rb, 128] uint32 -> int8 [Rb, 512] offset byte planes (col 128*p +
    lane = byte p of the word at lane, minus 128 so it fits int8). The
    kernel's one-hot gather runs on the int8 MXU and re-adds the offsets as
    one fused constant. Built on device from the resident u32 matrix (no
    extra host transfer); costs 1x the matrix footprint."""
    planes = [
        (((blocks2 >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(jnp.int32)
         - 128).astype(jnp.int8)
        for p in range(4)
    ]
    return jnp.concatenate(planes, axis=1)


def _lg(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Lane gather within 128-lane rows (lowers to tpu.dynamic_gather)."""
    return jnp.take_along_axis(x, idx, axis=1)


def _n_planes(wpad: int, n_colors: int) -> int:
    """Byte planes the kernel must gather: index bits >= n_colors are never
    set, so single-word rows only need ceil(C/8) of the 4 planes."""
    if wpad > 1:
        return 4
    return min(4, (n_colors + 7) // 8)


def _deoffset(planes: int) -> np.int32:
    """Sum over the gathered byte planes of the +128 de-offset corrections
    (bytes are stored offset by -128 to fit int8)."""
    v = sum(128 * (1 << (8 * p)) for p in range(planes))
    return np.int32(np.uint32(v).astype(np.int64) - ((1 << 32) if v >= (1 << 31) else 0))


def _n_color_groups(wpad: int) -> int:
    """Color-bit capacity is 32*wpad; the per-color epilogue works them in
    groups of 128 lanes (one vreg of colors per group)."""
    return max(1, wpad // 4)


def _stream_kernel(
    tb_ref, blk_ref, off_ref, qc_ref, *refs,
    num_hash, wpad, n_colors, cp, hw, planes, n_chunks, nt, raw=False,
    joint=False,
):
    tiles = refs[:nt]
    if raw:
        # raw mode (color-sharded stream): per-probe facts come OUT instead
        # of being folded into uniq/hist locally — a color shard cannot
        # decide global uniqueness/presence alone, so the shard_map body
        # psums nhits and per-hash presence across the color axis first
        # (parallel/sharded.py::stream_batch_colorshard)
        nh_ref, cs_ref, pm_ref, counts_ref, counts_scratch = refs[nt:]
    else:
        uniq_ref, counts_ref, hist_ref, counts_scratch = refs[nt:]
    H, W = num_hash, wpad
    HW = H * W
    CW = 32 * W
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        counts_scratch[:] = jnp.zeros_like(counts_scratch)
        if not raw:
            hist_ref[:] = jnp.zeros_like(hist_ref)

    # --- block gather: int8 one-hot row-select over nt byte-plane tiles
    # (only the live byte planes participate: index bits >= n_colors are
    # never set, so single-word rows need just ceil(C/8) planes). ONE
    # compare over the whole nt*T window builds the row one-hot; each
    # tile's dot takes its lane-aligned slice.
    PLW = 128 * planes
    base = tb_ref[j] * T
    l2 = (blk_ref[:] - base)[:, None]  # i32 [PC, 1]
    iota_NT = jax.lax.broadcasted_iota(jnp.int32, (PC, nt * T), 1)
    S = (l2 == iota_NT).astype(jnp.int8)
    g = jax.lax.dot_general(
        S[:, 0:T], tiles[0][:, :PLW],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    for t in range(1, nt):
        g = g + jax.lax.dot_general(
            S[:, t * T:(t + 1) * T], tiles[t][:, :PLW],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    # g[p, 128*plane + lane] = byte(plane) of the probe's block word at
    # lane, minus 128 (all-zero for out-of-window probes, masked via qc==0)

    # --- per-probe word extraction: lane gathers --------------------------
    li = jax.lax.broadcasted_iota(jnp.int32, (PC, 128), 1)
    offw = off_ref[:][:, None].astype(jnp.uint32)  # 8-bit offsets per hash
    if W == 1:
        # lane h < H holds hash h's word; lanes beyond replicate hash H-1
        sh = (8 * jnp.minimum(li, H - 1)).astype(jnp.uint32)
        idx = ((offw >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)
    else:
        h_of = jnp.minimum(li // W, H - 1)
        off_j = (offw >> (8 * h_of).astype(jnp.uint32)) & jnp.uint32(0xFF)
        # lane j < HW: word j%W of hash j//W; lanes beyond HW replicate the
        # last hash's offsets (clamped h_of), which stay in [0, 128)
        idx = off_j.astype(jnp.int32) * W + (li % W)
    # combine the byte planes BEFORE the lane gather (gather commutes with
    # the per-lane arithmetic): one dynamic_gather instead of `planes`
    gcomb = g[:, 0:128]
    for p in range(1, planes):
        gcomb = gcomb + g[:, 128 * p:128 * (p + 1)] * (1 << (8 * p))
    words = _deoffset(planes) + _lg(gcomb, idx)
    # words[p, h*W + w] = u32 word w of hash h\'s row (int32 bit pattern)

    qc = qc_ref[:].astype(jnp.int32)  # [PC]; 0 marks padding/out-of-window
    realm_i = (qc > 0).astype(jnp.int32)

    # --- presence: every hash row nonzero ---------------------------------
    # Needed only for the uniq_ref -1/-2 encoding (n_valid): a probe with an
    # absent hash row ANDs to all-zero words, so vbits/nhits self-mask.
    hashmask = None
    if W == 1:
        # one tiny MXU dot replaces the lane-gather AND tree: count the
        # nonzero hash words (lanes < H) and compare against H
        nz8 = (words != 0).astype(jnp.int8)
        presm = (jax.lax.broadcasted_iota(jnp.int32, (128, 8), 0) < H
                 ).astype(jnp.int8)
        pres = jax.lax.dot_general(
            nz8, presm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)[:, 0]
        vrow = (pres == H).astype(jnp.int32) * realm_i
        if raw:
            hashmask = jnp.zeros((PC,), dtype=jnp.int32)
            for h in range(H):
                hashmask = hashmask + (
                    (words[:, h] != 0).astype(jnp.int32) << h
                )
    else:
        nz = (words != 0).astype(jnp.int32)
        step = W // 2
        while step >= 1:  # lane h*W = OR over the hash\'s W words
            nz = nz | _lg(nz, jnp.minimum(li + step, 127))
            step //= 2
        if raw:
            hashmask = jnp.zeros((PC,), dtype=jnp.int32)
            for h in range(H):
                hashmask = hashmask + (nz[:, h * W] << h)
        ph = _lg(nz, jnp.minimum(li * W, 127))
        step = H // 2
        while step >= 1:
            ph = ph & _lg(ph, jnp.minimum(li + step, 127))
            step //= 2
        vrow = ph[:, 0] * realm_i  # [PC] 0/1
    if raw:
        hashmask = hashmask * realm_i  # out-of-window/padding: no presence

    # --- AND across hashes + per-color epilogue ----------------------------
    # nhits/colorsum reduce via one int8 MXU contraction per color group
    # (cross-lane VPU reductions are log-depth shuffle chains; dots are
    # cheaper), and per-color counts contract the probe axis on the MXU
    # instead of a scratch read-modify-write.
    ones8 = jnp.ones((8, PC), dtype=jnp.int8)
    rows128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    cols128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    redm = ((cols128 == 0).astype(jnp.int32)
            + (cols128 == 1).astype(jnp.int32) * rows128).astype(jnp.int8)
    if W == 1:
        # static lane-slice broadcasts instead of dynamic-gather tree: the
        # replicated and-word is all the unpack below needs
        rep = jnp.broadcast_to(words[:, 0:1], (PC, 128))
        for h in range(1, H):
            rep = rep & jnp.broadcast_to(words[:, h:h + 1], (PC, 128))
        bits = (rep >> (li % 32)) & 1
        # absent-row probes already have bits == 0 (AND over an all-zero
        # row), so only padding (qc == 0) and lane replication need masking
        mi = realm_i[:, None] * (li < CW).astype(jnp.int32)
        vb8 = (bits * mi).astype(jnp.int8)
        csum = jax.lax.dot_general(
            ones8, vb8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # [8, 128]
        counts_scratch[:, 0:128] = counts_scratch[:, 0:128] + csum
        red = jax.lax.dot_general(
            vb8, redm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        nhits = red[:, 0]
        colorsum = red[:, 1]
    else:
        x = words
        step = W * (H // 2)
        while step >= W:
            x = x & _lg(x, jnp.minimum(li + step, 127))
            step //= 2
        # lanes 0..W-1 of x now hold the and-words; colors beyond 128 lanes
        # are worked in groups of 128 (and-words 4cg..4cg+3 per group)
        nhits = jnp.zeros((PC,), dtype=jnp.int32)
        colorsum = jnp.zeros((PC,), dtype=jnp.int32)
        for cg in range(_n_color_groups(W)):
            repg = _lg(x, jnp.minimum(4 * cg + li // 32, W - 1))
            bits = (repg >> (li % 32)) & 1
            lim = CW - 128 * cg  # live color-bit lanes in this group
            mi = realm_i[:, None] * (li < lim).astype(jnp.int32)
            vb8 = (bits * mi).astype(jnp.int8)
            csum = jax.lax.dot_general(
                ones8, vb8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # [8, 128]
            counts_scratch[:, 128 * cg:128 * (cg + 1)] = (
                counts_scratch[:, 128 * cg:128 * (cg + 1)] + csum
            )
            red = jax.lax.dot_general(
                vb8, redm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            nhits = nhits + red[:, 0]
            colorsum = colorsum + red[:, 1] + 128 * cg * red[:, 0]
    if raw:
        nh_ref[:] = nhits
        cs_ref[:] = colorsum
        pm_ref[:] = hashmask
    else:
        uniq = (vrow == 1) & (nhits == 1)
        # -1: valid but not a unique hit; -2: invalid/padded (lets the
        # caller count n_valid without a second kernel output)
        uniq_ref[:] = jnp.where(uniq, colorsum, jnp.where(vrow == 1, -1, -2))

        # --- uniq-hit frequency histogram: int8 one-hot MXU contraction ---
        qclip = jnp.clip(qc, 0, hw - 1)
        small = uniq & (qc < hw)
        hist_col = jnp.where(small, colorsum, n_colors)[:, None]
        if joint:
            # narrow-color diet: building a [PC, hw=1024] frequency one-hot
            # costs ~2 VPU passes over 1024 lanes per chunk. Splitting the
            # frequency into (hi = f >> 7, lo = f & 127) and fusing hi into
            # the color one-hot shrinks the operands to cp*HH + 128 lanes:
            # delta2[c*HH + hi, lo] = count(color c, freq 128*hi + lo), so
            # hist_ref rows are (color, freq-hi) pairs and the caller's
            # reshape(cp, hw) recovers the [color, freq] layout exactly.
            HH = hw // 128
            jcol = hist_col * HH + (qclip[:, None] >> 7)
            ochi = (jcol == jax.lax.broadcasted_iota(
                jnp.int32, (PC, cp * HH), 1)).astype(jnp.int8)
            ovlo = ((qclip[:, None] & 127) == jax.lax.broadcasted_iota(
                jnp.int32, (PC, 128), 1)).astype(jnp.int8)
            delta = jax.lax.dot_general(
                ochi, ovlo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [cp*HH, 128]
        else:
            oc = (hist_col == jax.lax.broadcasted_iota(
                jnp.int32, (PC, cp), 1)).astype(jnp.int8)
            ov = (qclip[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (PC, hw), 1)).astype(jnp.int8)
            delta = jax.lax.dot_general(
                oc, ov, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [cp, hw]
        hist_ref[:] = hist_ref[:] + delta

    @pl.when(j == n_chunks - 1)
    def _final():
        # every scratch row holds the same accumulated column sum
        counts_ref[0, :] = counts_scratch[0, :]


@partial(
    jax.jit,
    static_argnames=("num_hash", "wpad", "n_colors", "cp"),
)
def _stream_call(blocks_bp, blk_s, off_s, qc_s, tb, *, num_hash, wpad,
                 n_colors, cp):
    P = blk_s.shape[0]
    n_chunks = P // PC
    CGP = 128 * _n_color_groups(wpad)  # color-bit capacity, 128-padded
    hw = _hist_w(n_colors)
    nt = _nt_win(wpad)
    # joint (color, freq-hi) histogram rows pay off exactly when they shrink
    # the one-hot operands: cp*HH + 128 < cp + hw, i.e. the narrow-color
    # cp == 32 case (the wide layouts keep the flat [cp, hw] contraction)
    joint = hw == 1024 and cp == 32
    hist_shape = (cp * (hw // 128), 128) if joint else (cp, hw)
    tile_spec = lambda t: pl.BlockSpec((T, 512), lambda j, tb, t=t: (tb[j] + t, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
        ] + [tile_spec(t) for t in range(nt)],
        out_specs=(
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((8, CGP), lambda j, tb: (0, 0)),
            pl.BlockSpec(hist_shape, lambda j, tb: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, CGP), jnp.int32),
        ],
    )
    uniq, counts, hist = pl.pallas_call(
        partial(
            _stream_kernel,
            num_hash=num_hash,
            wpad=wpad,
            n_colors=n_colors,
            cp=cp,
            hw=hw,
            planes=_n_planes(wpad, n_colors),
            n_chunks=n_chunks,
            nt=nt,
            joint=joint,
        ),
        grid_spec=grid_spec,
        out_shape=(
            # per-probe uniq color; -1 = valid non-unique, -2 = invalid
            jax.ShapeDtypeStruct((P,), jnp.int32),
            jax.ShapeDtypeStruct((8, CGP), jnp.int32),  # counts in row 0
            jax.ShapeDtypeStruct(hist_shape, jnp.int32),  # histogram
        ),
        interpret=_interpret(),
    )(tb, blk_s, off_s, qc_s, *([blocks_bp] * nt))
    return uniq, counts, hist.reshape(cp, hw)


@partial(
    jax.jit,
    static_argnames=("num_hash", "wpad", "n_colors"),
)
def _stream_call_raw(blocks_bp, blk_s, off_s, qc_s, tb, *, num_hash, wpad,
                     n_colors):
    """_stream_call in raw mode: per-probe (nhits, colorsum, hash-presence
    bitmask) outputs + the local per-color counts — the color-sharded
    stream's local pass (global uniqueness/presence merge across shards in
    the shard_map body)."""
    P = blk_s.shape[0]
    n_chunks = P // PC
    CGP = 128 * _n_color_groups(wpad)
    nt = _nt_win(wpad)
    tile_spec = lambda t: pl.BlockSpec((T, 512), lambda j, tb, t=t: (tb[j] + t, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
        ] + [tile_spec(t) for t in range(nt)],
        out_specs=(
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((8, CGP), lambda j, tb: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, CGP), jnp.int32),
        ],
    )
    return pl.pallas_call(
        partial(
            _stream_kernel,
            num_hash=num_hash,
            wpad=wpad,
            n_colors=n_colors,
            cp=0,
            hw=0,
            planes=_n_planes(wpad, n_colors),
            n_chunks=n_chunks,
            nt=nt,
            raw=True,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((P,), jnp.int32),  # nhits
            jax.ShapeDtypeStruct((P,), jnp.int32),  # colorsum
            jax.ShapeDtypeStruct((P,), jnp.int32),  # hash-presence bitmask
            jax.ShapeDtypeStruct((8, CGP), jnp.int32),  # counts in row 0
        ),
        interpret=_interpret(),
    )(tb, blk_s, off_s, qc_s, *([blocks_bp] * nt))


def stream_raw_local(
    blocks2, blocks_bp, blk_s, off_s, qc_s, *, wpad, num_hash, rpb, n_colors
):
    """Local raw stream pass over sorted probes for ONE matrix shard:
    returns (counts [CGP], nhits [P], colorsum [P], presmask [P], n_drop).
    The chunk-granular residual pass patches the per-probe facts of
    out-of-window probes through the generic block gather, exactly like
    _stream_core's residual (traceable; used inside shard_map bodies)."""
    from .query import _gather_rows_blocked, _unpack_bits

    P = blk_s.shape[0]
    nt = _nt_win(wpad)
    nch = _nch(wpad)
    n_tiles = blocks2.shape[0] // T
    n_chunks = P // PC
    firsts = blk_s.reshape(n_chunks, PC)[:, 0]
    tb = jnp.clip(firsts // T, 0, n_tiles - nt).astype(jnp.int32)
    inwin2d = blk_s.reshape(n_chunks, PC) - tb[:, None] * T < nt * T
    qcw = jnp.where(inwin2d.reshape(-1), qc_s, 0)
    nhits, colorsum, presmask, counts_out = _stream_call_raw(
        blocks_bp, blk_s, off_s, qcw, tb,
        num_hash=num_hash, wpad=wpad, n_colors=n_colors,
    )
    counts = counts_out[0]

    res2d = (~inwin2d) & (qc_s.reshape(n_chunks, PC) > 0)
    chunk_res = res2d.sum(axis=1, dtype=jnp.int32)
    n_res = chunk_res.sum()
    has_res = chunk_res > 0
    covered = has_res & (jnp.cumsum(has_res.astype(jnp.int32)) <= nch)
    n_drop = jnp.sum(chunk_res * (has_res & ~covered).astype(jnp.int32))

    def _patch(args):
        cnts, nh, cs, pm = args
        cidx = jnp.nonzero(has_res, size=nch, fill_value=n_chunks)[0]
        cvalid = cidx < n_chunks
        csafe = jnp.minimum(cidx, n_chunks - 1)
        rblk = blk_s.reshape(n_chunks, PC)[csafe].reshape(-1)
        roff = off_s.reshape(n_chunks, PC)[csafe].reshape(-1)
        live = (res2d[csafe] & cvalid[:, None]).reshape(-1)
        rows = jnp.stack(
            [
                rblk * np.int32(rpb)
                + ((roff >> jnp.uint32(8 * h)) & jnp.uint32(0xFF)).astype(
                    jnp.int32
                )
                for h in range(num_hash)
            ],
            axis=1,
        )
        g = _gather_rows_blocked(blocks2, rows, wpad, rpb)  # [n, H, wpad]
        andw = g[:, 0, :]
        for h in range(1, num_hash):
            andw = andw & g[:, h, :]
        bits = _unpack_bits(andw)[:, :n_colors]
        lm = live.astype(jnp.int32)
        vb = bits * lm[:, None]
        nh_r = vb.sum(axis=1)
        cs_r = (vb * jnp.arange(n_colors, dtype=jnp.int32)[None, :]).sum(
            axis=1
        )
        pm_r = jnp.zeros_like(nh_r)
        for h in range(num_hash):
            pm_r = pm_r + (
                (g[:, h, :] != 0).any(axis=1).astype(jnp.int32) << h
            )
        pm_r = pm_r * lm
        cnts = cnts.at[: n_colors].add(vb.sum(axis=0))
        sh = (n_chunks, PC)
        sel = res2d[csafe]

        def mrow(full, part):
            f2 = full.reshape(sh)
            p2 = jnp.where(sel, part.reshape(nch, PC), f2[csafe])
            return f2.at[cidx].set(p2, mode="drop").reshape(-1)

        return (
            cnts,
            mrow(nh, nh_r),
            mrow(cs, cs_r),
            mrow(pm, pm_r),
        )

    counts, nhits, colorsum, presmask = jax.lax.cond(
        n_res > 0, _patch, lambda a: a, (counts, nhits, colorsum, presmask)
    )
    return counts, nhits, colorsum, presmask, n_drop


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=("wpad", "k", "num_hash", "bloom_size", "rpb",
                     "n_colors", "bv"),
)
def stream_accumulate_hash(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    blocks_bp: jnp.ndarray,  # int8 [Rb, 512] from byte_plane_blocks
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
    bv: int = 2,
):
    """Drop-in replacement for query_accumulate_hash_scan on blocked-v2/v3
    indexes: same donated stats/hist/overflow contract, one device call per
    segment. An extra guard counter is returned separately (n_dropped) —
    nonzero means the segment must be re-run on the generic path
    (overflow/residual capacity exceeded; effectively never)."""
    P = packed.shape[0]
    blk, offs = _device_blkoff(packed[:, 0], packed[:, 1], k, num_hash,
                               bloom_size, rpb, bv)
    offp = pack_offsets(offs)
    qc32 = qcounts.astype(jnp.int32)
    gidx = base0 + jnp.arange(P, dtype=jnp.int32)

    if _qc_in_key_ok(bloom_size, rpb):
        # sort diet: carry min(freq, FREQ_CAP) in the key's low bits (one
        # payload array fewer). Exactness below FREQ_CAP is all the kernel
        # histogram needs; clipped frequencies route to the overflow list,
        # whose gidx payload resolves the exact value on the host — the
        # same contract the unpacked sort had.
        qcl = jnp.minimum(qc32, FREQ_CAP).astype(jnp.uint32)
        key = (blk.astype(jnp.uint32) << QKEY_BITS) | qcl
        key_s, off_s, gidx_s = jax.lax.sort((key, offp, gidx), num_keys=1)
        blk_s = (key_s >> QKEY_BITS).astype(jnp.int32)
        qc_s = (key_s & QKEY_MASK).astype(jnp.int32)
    else:
        blk_s, off_s, qc_s, gidx_s = jax.lax.sort(
            (blk, offp, qc32, gidx), num_keys=1
        )
    return _stream_core(
        stats, hist, over_col, over_freq, blocks2, blocks_bp,
        blk_s, off_s, qc_s, gidx_s,
        wpad=wpad, num_hash=num_hash, rpb=rpb, n_colors=n_colors,
    )


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=("wpad", "k", "num_hash", "bloom_size", "rpb",
                     "n_colors", "bv", "qc_in_key"),
)
def stream_accumulate_hash_exact(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    blocks_bp: jnp.ndarray,
    packed: jnp.ndarray,  # uint32 [P, 2]; P % PC == 0
    qcounts: jnp.ndarray,  # int32 [P] FULL frequencies; 0 marks padding
    *,
    wpad: int,
    k: int,
    num_hash: int,
    bloom_size: int,
    rpb: int,
    n_colors: int,
    bv: int = 2,
    qc_in_key: bool = False,
):
    """stream_accumulate_hash in exact mode: the overflow payload is the
    frequency itself, so the sort carries 3 arrays instead of 4 (no global
    k-mer index) and the caller needs no host-side frequency resolution.
    Frequencies must be the real int32 counts (not clipped).

    qc_in_key=True shrinks the sort to 2 arrays by packing the frequency
    into the key's low QKEY_BITS. The CALLER must guarantee every
    frequency < 2^QKEY_BITS (and the block-index guard _qc_in_key_ok);
    larger values would be silently clipped — including in the overflow
    payload — so gate on the batch maximum."""
    blk, offs = _device_blkoff(packed[:, 0], packed[:, 1], k, num_hash,
                               bloom_size, rpb, bv)
    offp = pack_offsets(offs)
    if qc_in_key and _qc_in_key_ok(bloom_size, rpb):
        key = (blk.astype(jnp.uint32) << QKEY_BITS) | jnp.clip(
            qcounts, 0, QKEY_MASK).astype(jnp.uint32)
        key_s, off_s = jax.lax.sort((key, offp), num_keys=1)
        blk_s = (key_s >> QKEY_BITS).astype(jnp.int32)
        qc_s = (key_s & QKEY_MASK).astype(jnp.int32)
    else:
        blk_s, off_s, qc_s = jax.lax.sort((blk, offp, qcounts), num_keys=1)
    return _stream_core(
        stats, hist, over_col, over_freq, blocks2, blocks_bp,
        blk_s, off_s, qc_s, qc_s,
        wpad=wpad, num_hash=num_hash, rpb=rpb, n_colors=n_colors,
    )


# --- classic (reference-placement) sorted-row stream ------------------------
#
# The classic layout (simple_bloom.rs:19-26) places a k-mer's H rows
# INDEPENDENTLY: row_i = xxh3_64_with_seed(kmer, i) % bloom_size. The blocked
# kernels above are unreachable from it, so reference-bit-exact indexes used
# to fall back to the generic block gather (~75M blocks/s = ~19M k-mers/s at
# H=4). This path replaces that with a bandwidth-shaped plan: flatten the
# H*P row probes, sort them by row, stream matrix tiles through a Pallas
# window while each probe pulls its single u32 row word, un-sort the words
# back to probe order with a second key sort, and recombine each k-mer's H
# words with the shared AND/count/histogram epilogue (_accumulate_tail).
# Both sorts are the dominant cost; the kernel itself runs PC_CL probes per
# grid step (4x the blocked kernel) because its per-probe work is tiny.

# classic-kernel probes per grid step: 8192 with the rows-first one-hot
# overflows the 16M scoped-vmem budget by ~0.4M regardless of how the
# row one-hot is staged (measured twice 2026-08-21); per-chunk cost
# scales with pc and fixed overhead is noise, so 4096 loses nothing
PC_CL = 4096
# residual chunk capacity (chunk-granular re-run): follows the PC_CL
# halving so the probe coverage (NCH_CL * PC_CL) is unchanged
NCH_CL = 128
# epilogue scan segment; callers pad k-mer counts to this. 262144 quarters
# the scan's iteration count (the joint-histogram one-hots in
# _accumulate_tail made bigger segments cheap); queries small enough to
# mind the padding never pass _use_stream_classic's density gate anyway
EPC_CL = 262144


def _classic_word_kernel(tb_ref, blk_ref, off_ref, *refs, planes, nt, pc):
    """Per sorted probe: word = matrix[row] as int32, where row = blk*128 +
    off and blk lies in the chunk's nt-tile window. The gather contracts
    WINDOW ROWS first — one row one-hot S[p, r] = (blk[p]-base == r) over
    the whole nt*T window, contracted against each tile's byte plane on the
    int8 MXU, gives A_p[p, l] = byte p of the probe's row at lane l — then
    a lane-gather at off[p] selects the word's bytes. Contracting rows
    first needs no per-tile plane-combine or in/out-of-window select chain
    (an out-of-window probe's one-hot row is all-zero, so its word is the
    same garbage constant the caller's residual pass already patches),
    which cut the kernel from ~198ms to the dot/gather floor at bench
    density (measured 2026-08-21)."""
    tiles = refs[:nt]
    (out_ref,) = refs[nt:]
    j = pl.program_id(0)
    base = tb_ref[j] * T
    l2 = (blk_ref[:] - base)[:, None]  # [pc, 1] window block index
    # per-tile row one-hots against a [pc, T] iota (an [pc, nt*T] i32 iota
    # alone is 8MB at pc=8192 and tips the 16M scoped-vmem budget)
    iota_T = jax.lax.broadcasted_iota(jnp.int32, (pc, T), 1)
    Ss = [((l2 - t * T) == iota_T).astype(jnp.int8) for t in range(nt)]
    idx = jnp.broadcast_to(off_ref[:][:, None], (pc, 128))
    word = jnp.zeros((pc,), dtype=jnp.int32)
    for p in range(planes):
        A = jax.lax.dot_general(
            Ss[0], tiles[0][:, 128 * p:128 * (p + 1)],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        for t in range(1, nt):
            A = A + jax.lax.dot_general(
                Ss[t], tiles[t][:, 128 * p:128 * (p + 1)],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        word = word + _lg(A, idx)[:, 0] * (1 << (8 * p))
    out_ref[:] = word + _deoffset(planes)


@partial(jax.jit, static_argnames=("planes", "nt", "pc"))
def _classic_call(blocks_bp, blk_s, off_s, tb, *, planes, nt, pc):
    P = blk_s.shape[0]
    n_chunks = P // pc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((pc,), lambda j, tb: (j,)),
            pl.BlockSpec((pc,), lambda j, tb: (j,)),
        ] + [
            pl.BlockSpec((T, 512), lambda j, tb, t=t: (tb[j] + t, 0))
            for t in range(nt)
        ],
        out_specs=pl.BlockSpec((pc,), lambda j, tb: (j,)),
    )
    return pl.pallas_call(
        partial(_classic_word_kernel, planes=planes, nt=nt, pc=pc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P,), jnp.int32),
        interpret=_interpret(),
    )(tb, blk_s, off_s, *([blocks_bp] * nt))


@partial(
    jax.jit,
    donate_argnums=(0, 1, 2, 3),
    static_argnames=("wpad", "k", "num_hash", "bloom_size", "n_colors"),
)
def stream_accumulate_classic_exact(
    stats: jnp.ndarray,
    hist: jnp.ndarray,
    over_col: jnp.ndarray,
    over_freq: jnp.ndarray,
    blocks2: jnp.ndarray,
    blocks_bp: jnp.ndarray,  # int8 [Rb, 512] byte planes
    packed: jnp.ndarray,  # uint32 [P0, 2]; P0 % EPC_CL == 0
    qcounts: jnp.ndarray,  # int32 [P0] FULL frequencies; 0 marks padding
    *,
    wpad: int,
    k: int,
    num_hash: int,
    bloom_size: int,
    n_colors: int,
):
    """Sorted-row-stream query for the CLASSIC (reference-placement) layout
    in exact mode: same stats/hist/overflow contract as
    stream_accumulate_hash_exact (overflow entries record the frequency
    itself). Supports wpad == 1 (<= 32 colors); wider classic rows keep the
    generic gather. Returns (..., n_dropped): nonzero n_dropped means the
    residual chunk capacity was exceeded (sparse probe distributions) and
    the caller must re-run generically."""
    from .query import _accumulate_tail, _device_rows, _gather_rows

    if wpad != 1:
        raise ValueError("classic stream kernel supports wpad == 1")
    P0 = packed.shape[0]
    H = num_hash
    rows = _device_rows(packed[:, 0], packed[:, 1], k, H, bloom_size, 0)
    P = P0 * H
    gidx = jnp.arange(P, dtype=jnp.int32)
    row_s, gidx_s = jax.lax.sort((rows.reshape(-1), gidx), num_keys=1)
    blk_s = row_s >> 7
    off_s = row_s & 127
    n_chunks = P // PC_CL
    n_tiles = blocks2.shape[0] // T
    nt = 2
    firsts = blk_s.reshape(n_chunks, PC_CL)[:, 0]
    tb = jnp.clip(firsts // T, 0, n_tiles - nt).astype(jnp.int32)
    inwin2d = (blk_s.reshape(n_chunks, PC_CL) - tb[:, None] * T) < nt * T
    planes = _n_planes(1, n_colors)
    words = _classic_call(
        blocks_bp, blk_s, off_s, tb, planes=planes, nt=nt, pc=PC_CL
    )

    # chunk-granular residual patch (same shape as _stream_core's): probes
    # outside their chunk's window live in a few low-density chunks; their
    # words re-fetch through the generic row gather and overwrite in place
    res2d = ~inwin2d
    chunk_res = res2d.sum(axis=1, dtype=jnp.int32)
    n_res = chunk_res.sum()
    has_res = chunk_res > 0
    covered = has_res & (jnp.cumsum(has_res.astype(jnp.int32)) <= NCH_CL)
    n_drop = jnp.sum(chunk_res * (has_res & ~covered).astype(jnp.int32))

    def _patch(w):
        w2 = w.reshape(n_chunks, PC_CL)
        cidx = jnp.nonzero(has_res, size=NCH_CL, fill_value=n_chunks)[0]
        cvalid = cidx < n_chunks
        csafe = jnp.minimum(cidx, n_chunks - 1)
        rrow = row_s.reshape(n_chunks, PC_CL)[csafe]  # [NCH_CL, PC_CL]
        g = _gather_rows(blocks2, rrow.reshape(-1, 1), 1)
        gw = jax.lax.bitcast_convert_type(
            g.reshape(NCH_CL, PC_CL), jnp.int32
        )
        patched = jnp.where(res2d[csafe] & cvalid[:, None], gw, w2[csafe])
        # write targets use the UNCLAMPED cidx: fill entries (cidx ==
        # n_chunks) drop instead of clobbering the clamp row's patch
        return w2.at[cidx].set(patched, mode="drop").reshape(-1)

    words = jax.lax.cond(n_res > 0, _patch, lambda w: w, words)

    # un-sort to probe order, then per-k-mer AND across the H words
    _, words_u = jax.lax.sort((gidx_s, words), num_keys=1)
    wordsH = words_u.reshape(P0, H)
    andw_i = wordsH[:, 0]
    for h in range(1, H):
        andw_i = andw_i & wordsH[:, h]
    andw = jax.lax.bitcast_convert_type(andw_i, jnp.uint32)[:, None]
    present = (wordsH != 0).all(axis=1)
    mask = qcounts > 0

    n_seg = P0 // EPC_CL
    aw = andw.reshape(n_seg, EPC_CL, 1)
    pr = present.reshape(n_seg, EPC_CL)
    mk = mask.reshape(n_seg, EPC_CL)
    qc = qcounts.reshape(n_seg, EPC_CL)

    def step(carry, xs):
        st, hi, oc, of = carry
        a, p, m, q = xs
        # exact mode: overflow payload is the frequency itself (gidx=q)
        return _accumulate_tail(
            st, hi, oc, of, a, p, m, q, 1, jnp.int32(0), gidx=q
        ), 0

    (stats, hist, over_col, over_freq), _ = jax.lax.scan(
        step, (stats, hist, over_col, over_freq), (aw, pr, mk, qc)
    )
    return stats, hist, over_col, over_freq, n_drop


def pack_offsets(offs: list) -> jnp.ndarray:
    """Per-hash in-block offsets -> one uint32 with 8 bits per hash (the
    stream kernel's off_ref encoding; rpb <= 128 so offsets fit 7 bits)."""
    offp = offs[0].astype(jnp.uint32)
    for h in range(1, len(offs)):
        offp = offp | (offs[h].astype(jnp.uint32) << jnp.uint32(8 * h))
    return offp


def _stream_core(
    stats, hist, over_col, over_freq, blocks2, blocks_bp,
    blk_s, off_s, qc_s, gidx_s, *, wpad, num_hash, rpb, n_colors,
):
    """Shared sorted-probe body: probes already sorted by block index
    (blk_s asc), with packed offsets, clipped frequencies (0 = padding) and
    an overflow payload per probe (a global k-mer index, or the exact
    frequency itself in exact mode). Runs the Pallas kernel over 2-tile
    windows and merges the accumulators; returns (..., n_dropped)."""
    # The W>1 presence/AND lane-gather trees below (_stream_kernel) halve a
    # step from H//2 and are exact only for power-of-two num_hash (e.g. H=3,
    # W=2 would AND hashes 0 and 1 but skip hash 2); the W==1 branches handle
    # arbitrary H. The engine gates eligibility the same way (engine.py).
    if wpad > 1 and (num_hash & (num_hash - 1)) != 0:
        raise ValueError(
            "stream kernel requires power-of-two num_hash when wpad > 1"
        )
    P = blk_s.shape[0]
    C = n_colors
    # histogram rows: colors 0..C-1 + the not-counted marker column C,
    # padded to a tile-friendly width
    cp = 32 if C < 32 else ((C + 1 + 127) // 128) * 128
    hw = _hist_w(C)
    nt = _nt_win(wpad)
    nch = _nch(wpad)
    n_tiles = blocks2.shape[0] // T

    n_chunks = P // PC
    firsts = blk_s.reshape(n_chunks, PC)[:, 0]
    tb = jnp.clip(firsts // T, 0, n_tiles - nt).astype(jnp.int32)
    inwin2d = blk_s.reshape(n_chunks, PC) - tb[:, None] * T < nt * T

    qcw = jnp.where(inwin2d.reshape(-1), qc_s, 0)
    uniq, counts_out, hist_out = _stream_call(
        blocks_bp, blk_s, off_s, qcw,
        tb, num_hash=num_hash, wpad=wpad, n_colors=C, cp=cp,
    )

    # merge the kernel accumulators into the running stats
    counts_new = stats[:C] + counts_out[0, :C]
    # global AND and all-valid, derived from counts: bit c of the AND over
    # valid k-mers is 1 iff every one of the n_valid k-mers hit color c,
    # i.e. counts[c] == n_valid (all-ones when n_valid == 0, matching the
    # reduce identity); ok iff every real k-mer was valid
    n_valid = jnp.sum((uniq > -2).astype(jnp.int32))
    n_real = jnp.sum((qcw > 0).astype(jnp.int32))
    eq = (counts_out[0, : 32 * wpad] == n_valid).astype(jnp.uint32)
    pow2 = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    and_b = jnp.sum(eq.reshape(wpad, 32) * pow2, axis=1, dtype=jnp.uint32)
    ok_b = (n_valid == n_real).astype(jnp.int32)
    hist = hist.at[:, :hw].add(hist_out[:C])

    # uniq-hit frequency overflow entries (freq >= hw): compacted and
    # appended at the running n_over offset. The probe-granular nonzero
    # hides a ~50ms sort over P, but the cond skips it whenever every
    # uniq-hit frequency fit the kernel histogram (always, for narrow
    # color counts, until frequencies reach FREQ_CAP).
    n_over_before = stats[C + wpad + 1]
    big = (uniq >= 0) & (qc_s >= hw)
    n_big = jnp.sum(big.astype(jnp.int32))
    capO = over_col.shape[0]

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

    # residual pass, CHUNK-granular: probes outside their chunk's window
    # live in a handful of value-coldspot chunks (module note), so the
    # compaction selects whole chunks — a nonzero over [n_chunks] flags
    # (microseconds) + contiguous row gathers — instead of a probe-level
    # nonzero whose hidden sort over P cost ~50ms per dispatch.
    res2d = (~inwin2d) & (qc_s.reshape(n_chunks, PC) > 0)
    chunk_res = res2d.sum(axis=1, dtype=jnp.int32)  # [n_chunks]
    n_res = chunk_res.sum()
    has_res = chunk_res > 0
    # residuals beyond the first nch residual chunks are dropped (caller
    # reruns generically); count them without compaction
    covered = has_res & (jnp.cumsum(has_res.astype(jnp.int32)) <= nch)
    n_proc = jnp.sum(chunk_res * covered.astype(jnp.int32))
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
        cidx = jnp.nonzero(has_res, size=nch, fill_value=n_chunks)[0]
        cvalid = cidx < n_chunks
        csafe = jnp.minimum(cidx, n_chunks - 1)
        rblk = blk_s.reshape(n_chunks, PC)[csafe].reshape(-1)
        roff = off_s.reshape(n_chunks, PC)[csafe].reshape(-1)
        rqc = qc_s.reshape(n_chunks, PC)[csafe].reshape(-1)
        rgid = gidx_s.reshape(n_chunks, PC)[csafe].reshape(-1)
        rvalid = (res2d[csafe] & cvalid[:, None]).reshape(-1)
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
            rqc * rvalid, wpad, jnp.int32(0), rpb,
            gidx=rgid,
        )

    stats_f, hist_f, over_col, over_freq = jax.lax.cond(
        n_res > 0,
        _residual,
        lambda args: args,
        (stats_mid, hist, over_col, over_freq),
    )
    n_drop_res = n_res - n_proc
    return stats_f, hist_f, over_col, over_freq, n_drop_over + n_drop_res
