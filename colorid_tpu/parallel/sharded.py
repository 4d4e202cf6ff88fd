"""Multi-chip sharded query execution (jax.sharding Mesh + shard_map).

The BIGSI engine has three parallel axes (SURVEY §2: the reference's rayon
threads map to these):

- **data**: k-mer/read batches split across devices (the reference's
  par_iter over read batches). Per-color counts merge with psum over ICI.
- **color**: the bit-slice matrix split along the packed color-word axis.
  Each device gathers from its own full-height matrix slice, so the HBM
  gather needs NO inter-device traffic; only the [C]-sized count vectors and
  presence bits are combined. This is the throughput layout for wide
  (metagenomic) indexes.
- **row**: the matrix split along the Bloom-row axis (each device owns
  bloom_size/n rows). A device treats rows it does not own as neutral
  (all-ones words, present) and the partial AND/presence combine with a
  bitwise-AND all_gather-reduce over the mesh. This is the memory-scaling
  layout when one device cannot hold the matrix.

All three compose in one mesh ("data" x "color"|"row"). Per-shard matrices
are pre-packed into the 128-lane block layout the fast gather needs
(ops/query.py::pack_matrix_blocks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.query import (
    _gather_rows,
    _gather_rows_blocked,
    _unpack_bits,
    pack_matrix_blocks,
    row_wpad,
)


def _gather(mat, rows, wpad, rpb):
    """Local-shard gather: single-block fetch for blocked layouts (a k-mer's
    H rows share one rpb-row block — nesting holds for any shard-local rpb
    that is a power-of-two multiple of the build-time rows-per-block), else
    the generic per-row block gather."""
    if rpb:
        return _gather_rows_blocked(mat, rows, wpad, rpb)
    return _gather_rows(mat, rows, wpad)


def make_mesh(n_data: int, n_model: int, model_axis: str) -> Mesh:
    devs = np.array(jax.devices()[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", model_axis))


def device_put_colorshard(matrix: np.ndarray, mesh: Mesh):
    """Split the color-word axis across shards; pack each shard for the
    block gather. Returns (blocks [n_shards, nb, 128] sharded, wpad)."""
    n = mesh.shape["color"]
    R, W = matrix.shape
    Wl = -(-W // n)
    wpad = row_wpad(Wl)
    shards = []
    for i in range(n):
        sl = np.zeros((R, Wl), dtype=np.uint32)
        lo = i * Wl
        hi = min(W, (i + 1) * Wl)
        if hi > lo:
            sl[:, : hi - lo] = matrix[:, lo:hi]
        b, wp = pack_matrix_blocks(sl)
        assert wp == wpad
        shards.append(b)
    stacked = np.stack(shards, axis=0)
    arr = jax.device_put(stacked, NamedSharding(mesh, P("color", None, None)))
    return arr, wpad, Wl


def device_put_rowshard(matrix: np.ndarray, mesh: Mesh, row_multiple: int = 1):
    """Split the Bloom-row axis across shards; pack each shard. Returns
    (blocks [n_shards, nb, 128] sharded, wpad, rows_per_shard).
    row_multiple rounds the shard height (blocked layouts need the blocked
    row group to never straddle a shard boundary)."""
    n = mesh.shape["row"]
    R, W = matrix.shape
    Rl = -(-R // n)
    Rl = -(-Rl // row_multiple) * row_multiple
    wpad = row_wpad(W)
    shards = []
    for i in range(n):
        sl = np.zeros((Rl, W), dtype=np.uint32)
        lo = i * Rl
        hi = min(R, (i + 1) * Rl)
        sl[: hi - lo] = matrix[lo:hi]
        b, wp = pack_matrix_blocks(sl)
        assert wp == wpad
        shards.append(b)
    stacked = np.stack(shards, axis=0)
    arr = jax.device_put(stacked, NamedSharding(mesh, P("row", None, None)))
    return arr, wpad, Rl


# ---------------------------------------------------------------------------
# color-sharded query
# ---------------------------------------------------------------------------


def _colorshard_body(wpad, Wl, rpb, mat, rows, mask):
    """Per-device body. mat: [1, nb, 128]; rows: [Nl, H]; mask: [Nl]."""
    g = _gather(mat[0], rows, wpad, rpb)[:, :, :Wl]  # [Nl, H, Wl]
    present_local = (g != 0).any(axis=2)  # [Nl, H]
    present = (
        jax.lax.psum(present_local.astype(jnp.int32), "color") > 0
    ).all(axis=1)
    valid = present & mask
    andw = g[:, 0, :]
    for h in range(1, g.shape[1]):
        andw = andw & g[:, h, :]
    bits = _unpack_bits(andw)  # [Nl, Cl]
    vbits = bits * valid[:, None].astype(jnp.int32)
    counts_l = vbits.sum(axis=0)  # [Cl] partial over local kmers
    counts = jax.lax.psum(counts_l, "data")
    nhits_l = vbits.sum(axis=1)
    nhits = jax.lax.psum(nhits_l, "color")
    base = jax.lax.axis_index("color") * bits.shape[1]
    coloridx_l = jnp.argmax(vbits, axis=1).astype(jnp.int32) + base
    has_local = nhits_l > 0
    cand = jnp.where(has_local, coloridx_l, -1)
    coloridx = jax.lax.pmax(cand, "color")
    uniq = jnp.where(valid & (nhits == 1), coloridx, -1)
    masked = jnp.where(valid[:, None], andw, jnp.uint32(0xFFFFFFFF))
    and_local = jax.lax.reduce(
        masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, dimensions=(0,)
    )
    gathered = jax.lax.all_gather(and_local, "data")  # [nd, Wl]
    and_all = jax.lax.reduce(
        gathered, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, dimensions=(0,)
    )
    ok_l = (present | ~mask).all()
    all_valid = jax.lax.pmin(ok_l.astype(jnp.int32), "data") > 0
    return counts, uniq, valid, and_all, all_valid


@partial(jax.jit, static_argnames=("mesh", "wpad", "Wl", "rpb"))
def query_batch_colorshard(matrix, rows, mask, *, mesh, wpad, Wl, rpb=0):
    """Same contract as ops.query.query_batch on a ("data","color") mesh;
    counts/and_all are concatenated over color shards (width n*Wl words).
    rpb > 0 enables the blocked single-fetch gather on each shard."""
    f = jax.shard_map(
        partial(_colorshard_body, wpad, Wl, rpb),
        mesh=mesh,
        in_specs=(P("color", None, None), P("data", None), P("data")),
        out_specs=(
            P("color"),  # counts concat over color shards
            P("data"),  # uniq per kmer
            P("data"),  # valid
            P("color"),  # and_all words
            P(),  # all_valid replicated
        ),
        check_vma=False,
    )
    return f(matrix, rows, mask)


# ---------------------------------------------------------------------------
# row-sharded query
# ---------------------------------------------------------------------------


def _rowshard_body(wpad, Rl, W, rpb, mat, rows, mask):
    """mat: [1, nb, 128] covering rows [lo, lo+Rl); rows: [Nl, H]."""
    lo = jax.lax.axis_index("row") * Rl
    local = rows - lo
    owned = (local >= 0) & (local < Rl)
    safe = jnp.clip(local, 0, Rl - 1)
    g = _gather(mat[0], safe, wpad, rpb)[:, :, :W]  # [Nl, H, W]
    ones = jnp.uint32(0xFFFFFFFF)
    g = jnp.where(owned[:, :, None], g, ones)  # neutral for AND
    present_or_neutral = jnp.where(owned, (g != 0).any(axis=2), True)
    andw = g[:, 0, :]
    for h in range(1, g.shape[1]):
        andw = andw & g[:, h, :]
    ga = jax.lax.all_gather(andw, "row")  # [nr, Nl, W]
    andw = jax.lax.reduce(ga, ones, jax.lax.bitwise_and, dimensions=(0,))
    present = (
        jax.lax.psum(present_or_neutral.astype(jnp.int32), "row")
        == jax.lax.axis_size("row")
    ).all(axis=1)
    valid = present & mask
    bits = _unpack_bits(andw)
    vbits = bits * valid[:, None].astype(jnp.int32)
    counts = jax.lax.psum(vbits.sum(axis=0), "data")
    nhits = vbits.sum(axis=1)
    coloridx = jnp.argmax(vbits, axis=1).astype(jnp.int32)
    uniq = jnp.where(valid & (nhits == 1), coloridx, -1)
    masked = jnp.where(valid[:, None], andw, ones)
    and_local = jax.lax.reduce(masked, ones, jax.lax.bitwise_and, dimensions=(0,))
    gathered = jax.lax.all_gather(and_local, "data")
    and_all = jax.lax.reduce(gathered, ones, jax.lax.bitwise_and, dimensions=(0,))
    ok_l = (present | ~mask).all()
    all_valid = jax.lax.pmin(ok_l.astype(jnp.int32), "data") > 0
    return counts, uniq, valid, and_all, all_valid


@partial(jax.jit, static_argnames=("mesh", "wpad", "Rl", "W", "rpb"))
def query_batch_rowshard(matrix, rows, mask, *, mesh, wpad, Rl, W, rpb=0):
    """Same contract as ops.query.query_batch on a ("data","row") mesh.
    rpb > 0 enables the blocked single-fetch gather (requires Rl to be a
    multiple of the blocked row group so blocks never straddle shards)."""
    f = jax.shard_map(
        partial(_rowshard_body, wpad, Rl, W, rpb),
        mesh=mesh,
        in_specs=(P("row", None, None), P("data", None), P("data")),
        out_specs=(P(), P("data"), P("data"), P(), P()),
        check_vma=False,
    )
    return f(matrix, rows, mask)


# ---------------------------------------------------------------------------
# row-sharded sorted-stream query (value-addressed v3/v4 blocked layouts)
# ---------------------------------------------------------------------------
#
# The single-device fast path (ops/stream_query.py) runs unchanged on a
# ("data", "row") mesh because the blocked layout keeps ALL of a k-mer's
# rows in one 512-byte block: each probe is owned by exactly ONE row shard,
# so a sorted probe stream partitions into contiguous per-shard slices at
# the shard block boundaries (the value-addressed placement is monotone)
# and every per-probe statistic is computed entirely locally. Cross-device
# traffic is only the final merge: psum of counts/histogram, AND-reduce of
# the and-words, pmin of the all-valid flag — no per-probe collectives.


def _stream_rowshard_body(
    wpad, num_hash, rpb, n_colors, nbl, mat, planes, blk, offp, qc
):
    from ..ops.query import FREQ_CAP
    from ..ops.stream_query import OVER_CAP, RES_CAP, _stream_core

    C = n_colors
    blk = blk[0, 0]  # [1, 1, Pl] per-device slices -> [Pl]
    offp = offp[0, 0]
    qc = qc[0, 0]
    base = (jax.lax.axis_index("row") * np.int32(nbl)).astype(jnp.int32)
    stats0 = jnp.concatenate(
        [
            jnp.zeros(C, dtype=jnp.int32),
            jnp.full(wpad, -1, dtype=jnp.int32),
            jnp.array([1, 0], dtype=jnp.int32),
        ]
    )
    hist0 = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
    capO = OVER_CAP + RES_CAP
    oc0 = jnp.zeros(capO, dtype=jnp.int32)
    of0 = jnp.zeros(capO, dtype=jnp.int32)
    stats, hist, oc, of, ndrop = _stream_core(
        stats0, hist0, oc0, of0, mat[0], planes[0],
        blk - base, offp, qc, qc,  # exact mode: overflow payload = the freq
        wpad=wpad, num_hash=num_hash, rpb=rpb, n_colors=C,
    )
    counts = jax.lax.psum(stats[:C], ("data", "row"))
    hist_g = jax.lax.psum(hist, ("data", "row"))
    ones = jnp.uint32(0xFFFFFFFF)
    aw = stats[C : C + wpad].astype(jnp.uint32)
    for ax in ("row", "data"):
        ga = jax.lax.all_gather(aw, ax)
        aw = jax.lax.reduce(ga, ones, jax.lax.bitwise_and, dimensions=(0,))
    ok = jax.lax.pmin(stats[C + wpad], ("data", "row"))
    ndrop_g = jax.lax.psum(ndrop, ("data", "row"))
    n_over = stats[C + wpad + 1]
    return (
        counts,
        aw,
        ok,
        hist_g,
        ndrop_g,
        n_over[None, None],
        oc[None, None],
        of[None, None],
    )


@partial(
    jax.jit,
    static_argnames=("mesh", "wpad", "num_hash", "rpb", "n_colors", "nbl"),
)
def stream_batch_rowshard(
    mat, planes, blk, offp, qc, *, mesh, wpad, num_hash, rpb, n_colors, nbl
):
    """Sorted-stream query over a ("data", "row") mesh.

    blk/offp/qc are [nd, nr, Pl] — probe slices pre-partitioned by shard
    block ownership (blk sorted asc within each slice, GLOBAL block ids;
    qc == 0 marks padding; Pl a multiple of the stream chunk). Returns
    (counts [C] replicated, and-words [wpad] replicated, ok scalar,
    hist [C, FREQ_CAP] replicated, n_dropped scalar, and the per-device
    overflow lists n_over [nd, nr], oc/of [nd, nr, capO])."""
    f = jax.shard_map(
        partial(
            _stream_rowshard_body, wpad, num_hash, rpb, n_colors, nbl
        ),
        mesh=mesh,
        in_specs=(
            P("row", None, None),
            P("row", None, None),
            P("data", "row", None),
            P("data", "row", None),
            P("data", "row", None),
        ),
        out_specs=(
            P(), P(), P(), P(), P(),
            P("data", "row"),
            P("data", "row", None),
            P("data", "row", None),
        ),
        check_vma=False,
    )
    return f(mat, planes, blk, offp, qc)


# ---------------------------------------------------------------------------
# color-sharded sorted-stream query (shard-placed v3/v4 indexes,
# `build --color-shards N`)
# ---------------------------------------------------------------------------
#
# A > 1024-color index exceeds the single-device stream kernel's width, but
# each shard of a ("data", "color") mesh holds a <= 1024-color slice of
# every row. With the blocked placement sized to the SHARD's packed width
# (index.place_rpb == 128 // shard wpad), every shard can run the stream
# kernel locally in RAW mode (per-probe nhits/colorsum/hash-presence out,
# counts in-kernel). The global epilogue needs two cross-shard facts per
# probe — total hit count (uniqueness spans all colors) and per-hash row
# presence (a row is absent only if ALL shards see zeros) — merged with one
# psum each over the color axis; the uniq-hit frequency histogram then
# accumulates per OWNING shard with a chunked one-hot MXU contraction.


def _stream_colorshard_body(
    wpad, num_hash, rpb, Cl, cp, cap, mat, planes, blk, offp, qc
):
    from ..ops.query import FREQ_CAP
    from ..ops.stream_query import stream_raw_local

    counts_l, nh_l, cs_l, pm_l, ndrop = stream_raw_local(
        mat[0], planes[0], blk, offp, qc,
        wpad=wpad, num_hash=num_hash, rpb=rpb, n_colors=Cl,
    )
    P = blk.shape[0]
    nh_g = jax.lax.psum(nh_l, "color")
    ph = jnp.stack(
        [(pm_l >> h) & 1 for h in range(num_hash)], axis=1
    )  # [P, H]
    present = (jax.lax.psum(ph, "color") > 0).all(axis=1)
    realm = qc > 0
    validp = present & realm
    n_valid = jax.lax.psum(validp.sum(dtype=jnp.int32), "data")
    uniq = validp & (nh_g == 1)
    owner = uniq & (nh_l == 1)

    CW = 32 * wpad
    counts32 = jax.lax.psum(counts_l[:CW], "data")
    eq = (counts32 == n_valid).astype(jnp.uint32)
    pow2 = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    and_b = jnp.sum(eq.reshape(wpad, 32) * pow2, axis=1, dtype=jnp.uint32)
    bad = jax.lax.psum(
        (realm & ~present).sum(dtype=jnp.int32), "data"
    )
    ok = (bad == 0).astype(jnp.int32)

    # uniq-hit frequency histogram, chunked one-hot MXU over owned probes
    hw = FREQ_CAP
    HC = 8192
    while P % HC:  # P is a multiple of the stream chunk (2048)
        HC //= 2
    n_h = P // HC
    sel = owner & (qc < hw)
    col_c = jnp.where(sel, cs_l, Cl).reshape(n_h, HC)
    q_c = jnp.clip(qc, 0, hw - 1).reshape(n_h, HC)

    def hstep(acc, xs):
        cc, qq = xs
        oc = (cc[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (HC, cp), 1)).astype(jnp.int8)
        ov = (qq[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (HC, hw), 1)).astype(jnp.int8)
        return acc + jax.lax.dot_general(
            oc, ov, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ), 0

    hist, _ = jax.lax.scan(
        hstep, jnp.zeros((cp, hw), dtype=jnp.int32), (col_c, q_c)
    )

    big = owner & (qc >= hw)
    n_big = big.sum(dtype=jnp.int32)
    bidx = jnp.nonzero(big, size=cap, fill_value=P)[0]
    safe = jnp.minimum(bidx, P - 1)
    live = bidx < P
    oc_l = jnp.where(live, cs_l[safe], 0)
    of_l = jnp.where(live, qc[safe], 0)
    n_over = jnp.minimum(n_big, cap)
    ndrop = ndrop + jnp.maximum(n_big - cap, 0)
    ndrop_g = jax.lax.psum(ndrop, ("data", "color"))
    return (
        counts32,
        and_b,
        ok,
        hist,
        ndrop_g,
        n_over[None, None],
        oc_l[None, None],
        of_l[None, None],
    )


@partial(
    jax.jit,
    static_argnames=("mesh", "wpad", "num_hash", "rpb", "Cl", "cp", "cap"),
)
def stream_batch_colorshard(
    mat, planes, blk, offp, qc, *, mesh, wpad, num_hash, rpb, Cl, cp, cap
):
    """Sorted-stream query over a ("data", "color") mesh for shard-placed
    indexes. blk/offp/qc are [P] global sorted probes (qc == 0 marks
    padding; P a multiple of n_data * PC); every color shard sees the same
    probe slice. Returns per-shard counts [S, 32*wpad], and-words
    [S, wpad], ok scalar, hist [S, cp, FREQ_CAP], n_dropped scalar, and
    per-device overflow lists (local color ids — the host adds the shard
    base)."""
    f = jax.shard_map(
        partial(
            _stream_colorshard_body, wpad, num_hash, rpb, Cl, cp, cap
        ),
        mesh=mesh,
        in_specs=(
            P("color", None, None),
            P("color", None, None),
            P("data"),
            P("data"),
            P("data"),
        ),
        out_specs=(
            P("color"),
            P("color"),
            P(),
            P("color", None),
            P(),
            P("data", "color"),
            P("data", "color", None),
            P("data", "color", None),
        ),
        check_vma=False,
    )
    return f(mat, planes, blk, offp, qc)


@jax.jit
def byte_planes_3d(mat: jnp.ndarray) -> jnp.ndarray:
    """[S, Rb, 128] uint32 -> int8 [S, Rb, 512] offset byte planes (the
    sharded twin of ops/stream_query.byte_plane_blocks; elementwise + concat
    on an unsharded axis, so the input's row sharding carries over)."""
    planes = [
        (((mat >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(jnp.int32)
         - 128).astype(jnp.int8)
        for p in range(4)
    ]
    return jnp.concatenate(planes, axis=-1)


# ---------------------------------------------------------------------------
# sharded device extraction (search_reads on a mesh)
# ---------------------------------------------------------------------------


def _extract_merge_body(k, L, filter_t, d, reads, lens):
    """Per-device body: extract + count the local read shard's canonical
    k-mer windows, then merge to a GLOBAL unique set (the reference counts
    k-mers over the whole fastq before filtering, batch_search_pe.rs:28-39,
    so per-shard filtering would change results). Merge = all_gather the
    per-shard (key, local-count) sets over the data axis, sort once, sum
    duplicate counts, apply the strictly-greater filter, and keep the slice
    of the sorted array this shard owns (disjoint + exhaustive). Every
    device redundantly sorts the gathered set — simple and exact; the
    gathered set is unique-per-shard so it is far smaller than the raw
    window stream."""
    from ..ops.extract import extract_count

    pk, qc, _n = extract_count(reads, lens, k=k, L=L, filter_t=0, d=d)
    SENT = jnp.uint32(0xFFFFFFFF)
    pad = qc == 0
    lo = jnp.where(pad, SENT, pk[:, 0])
    hi = jnp.where(pad, SENT, pk[:, 1])
    ga_hi = jax.lax.all_gather(hi, "data").reshape(-1)
    ga_lo = jax.lax.all_gather(lo, "data").reshape(-1)
    ga_qc = jax.lax.all_gather(qc, "data").reshape(-1)
    s_hi, s_lo, s_qc = jax.lax.sort((ga_hi, ga_lo, ga_qc), num_keys=2)
    N = s_hi.shape[0]
    iota = jnp.arange(N, dtype=jnp.int32)
    new = (iota == 0) | (s_hi != jnp.roll(s_hi, 1)) | (s_lo != jnp.roll(s_lo, 1))
    starts = jnp.where(new, iota, np.int32(N))
    suffix_min = jax.lax.cummin(starts, axis=0, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), N, dtype=jnp.int32)]
    )
    csum = jnp.cumsum(s_qc)
    left = jnp.where(iota > 0, csum[jnp.maximum(iota - 1, 0)], 0)
    total = csum[next_start - 1] - left
    keep = new & ~((s_hi == SENT) & (s_lo == SENT)) & (total > filter_t)
    nd = jax.lax.axis_size("data")
    T = N // nd
    s = jax.lax.axis_index("data")
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s * T, T)
    klo, khi, kp, tt = sl(s_lo), sl(s_hi), sl(keep), sl(total)
    # compact owned uniques to the front so callers can query a tight slice
    pos = jnp.cumsum(kp) - 1
    to = jnp.where(kp, pos, np.int32(T)).astype(jnp.int32)
    keys_out = jnp.zeros((T, 2), dtype=jnp.uint32)
    keys_out = keys_out.at[to].set(jnp.stack([klo, khi], axis=1), mode="drop")
    qc_out = jnp.zeros(T, dtype=jnp.int32).at[to].set(tt, mode="drop")
    n_owned = kp.sum().astype(jnp.int32)[None]
    return keys_out, qc_out, n_owned


@partial(jax.jit, static_argnames=("mesh", "k", "L", "filter_t", "d"))
def extract_merge_datashard(reads, lens, *, mesh, k, L, filter_t, d=1):
    """Device extraction + global unique/count/filter over the data axis.
    reads [R, ceil(L/16)] uint32 (R a multiple of mesh data size); returns
    (keys [nd*T, 2] sharded over data (owned uniques compacted per shard),
    qcounts [nd*T] (0 = padding), n_owned [nd])."""
    f = jax.shard_map(
        partial(_extract_merge_body, k, L, filter_t, d),
        mesh=mesh,
        in_specs=(P("data", None), P("data")),
        out_specs=(P("data", None), P("data"), P("data")),
        check_vma=False,
    )
    return f(reads, lens)


def _hash_packed_body(k, num_hash, bloom_size, rpb_place, bv, keys2):
    from ..ops.query import _device_rows

    return _device_rows(keys2[:, 0], keys2[:, 1], k, num_hash, bloom_size,
                        rpb_place, bv)


@partial(
    jax.jit,
    static_argnames=("mesh", "k", "num_hash", "bloom_size", "rpb_place", "bv"),
)
def hash_packed_datashard(
    keys2, *, mesh, k, num_hash, bloom_size, rpb_place=0, bv=1
):
    """On-device XXH3 Bloom rows [N, H] for data-sharded packed k-mers
    (rpb_place/bv = the index's build-time blocked placement)."""
    f = jax.shard_map(
        partial(_hash_packed_body, k, num_hash, bloom_size, rpb_place, bv),
        mesh=mesh,
        in_specs=(P("data", None),),
        out_specs=P("data", None),
        check_vma=False,
    )
    return f(keys2)


# ---------------------------------------------------------------------------
# sharded read classifier (read_id hot loop on a mesh)
# ---------------------------------------------------------------------------


def _readid_color_body(
    wpad, Wl, start_sample, n_reads_l, rpb, mat, rows, seg, pos
):
    """Per-device read_id body on a ("data","color") mesh. Reads partition
    across the data axis (the reference's rayon par_iter over reads,
    read_id_mt_pe.rs:300-361); each color shard counts its own color slice.
    Row presence (the break condition) is global: psum over color.

    mat: [1, nb, 128]; rows: [1, Nl, H]; seg/pos: [1, Nl] (seg relative to
    the shard's read base, pos = FnvHashSet iteration rank)."""
    return _readid_color_core(
        wpad, Wl, start_sample, n_reads_l, rpb, mat, rows[0], seg[0], pos[0]
    )


def _readid_color_core(
    wpad, Wl, start_sample, n_reads_l, rpb, mat, rows, seg, pos
):
    g = _gather(mat[0], rows, wpad, rpb)[:, :, :Wl]
    present_l = (g != 0).any(axis=2)  # [Nl, H]
    present = (
        jax.lax.psum(present_l.astype(jnp.int32), "color") > 0
    ).all(axis=1)
    BIG = jnp.int32(2**30)
    absent_pos = jnp.where(present, BIG, pos)
    first_absent = (
        jnp.full((n_reads_l,), BIG, dtype=jnp.int32).at[seg].min(absent_pos)
    )
    fa = first_absent[seg]
    counted = present & (pos < fa)
    andw = g[:, 0, :]
    for h in range(1, g.shape[1]):
        andw = andw & g[:, h, :]
    bits = _unpack_bits(andw)[:, : Wl * 32]  # [Nl, Cl]
    cbits = bits * counted[:, None].astype(jnp.int32)
    if start_sample > 0:
        # candidate membership is per-color, hence shard-local
        ph1 = cbits * (pos < start_sample)[:, None].astype(jnp.int32)
        cand = (
            jnp.zeros((n_reads_l, bits.shape[1]), dtype=jnp.int32)
            .at[seg]
            .max(ph1)
        )
        ph2 = cbits * (pos >= start_sample)[:, None].astype(jnp.int32)
        contrib = ph1 + ph2 * cand[seg]
    else:
        contrib = cbits
    report = (
        jnp.zeros((n_reads_l, bits.shape[1]), dtype=jnp.int32)
        .at[seg]
        .add(contrib)
    )
    no_hits = (first_absent < BIG).astype(jnp.int32)
    return report, no_hits


@partial(
    jax.jit,
    static_argnames=("mesh", "wpad", "Wl", "start_sample", "n_reads_l", "rpb"),
)
def readid_batch_colorshard(
    matrix, rows, seg, pos, *, mesh, wpad, Wl, start_sample, n_reads_l, rpb=0
):
    """query_readid_batch on a ("data","color") mesh: returns
    (report [nd*n_reads_l, n_color*Wl*32], no_hits [nd*n_reads_l])."""
    f = jax.shard_map(
        partial(_readid_color_body, wpad, Wl, start_sample, n_reads_l, rpb),
        mesh=mesh,
        in_specs=(
            P("color", None, None),
            P("data", None, None),
            P("data", None),
            P("data", None),
        ),
        out_specs=(P("data", "color"), P("data")),
        check_vma=False,
    )
    return f(matrix, rows, seg, pos)


def _readid_row_body(
    wpad, Rl, W, start_sample, n_reads_l, rpb, mat, rows, seg, pos
):
    """read_id body on a ("data","row") mesh: partial ANDs all_gather over
    the row axis (like _rowshard_body), then the segment logic runs
    replicated per data shard."""
    return _readid_row_core(
        wpad, Rl, W, start_sample, n_reads_l, rpb, mat, rows[0], seg[0],
        pos[0],
    )


def _readid_row_core(
    wpad, Rl, W, start_sample, n_reads_l, rpb, mat, rows, seg, pos
):
    lo = jax.lax.axis_index("row") * Rl
    local = rows - lo
    owned = (local >= 0) & (local < Rl)
    safe = jnp.clip(local, 0, Rl - 1)
    g = _gather(mat[0], safe, wpad, rpb)[:, :, :W]
    ones = jnp.uint32(0xFFFFFFFF)
    g = jnp.where(owned[:, :, None], g, ones)
    present_or_neutral = jnp.where(owned, (g != 0).any(axis=2), True)
    andw = g[:, 0, :]
    for h in range(1, g.shape[1]):
        andw = andw & g[:, h, :]
    ga = jax.lax.all_gather(andw, "row")
    andw = jax.lax.reduce(ga, ones, jax.lax.bitwise_and, dimensions=(0,))
    present = (
        jax.lax.psum(present_or_neutral.astype(jnp.int32), "row")
        == jax.lax.axis_size("row")
    ).all(axis=1)
    BIG = jnp.int32(2**30)
    absent_pos = jnp.where(present, BIG, pos)
    first_absent = (
        jnp.full((n_reads_l,), BIG, dtype=jnp.int32).at[seg].min(absent_pos)
    )
    fa = first_absent[seg]
    counted = present & (pos < fa)
    bits = _unpack_bits(andw)[:, : W * 32]
    cbits = bits * counted[:, None].astype(jnp.int32)
    if start_sample > 0:
        ph1 = cbits * (pos < start_sample)[:, None].astype(jnp.int32)
        cand = (
            jnp.zeros((n_reads_l, bits.shape[1]), dtype=jnp.int32)
            .at[seg]
            .max(ph1)
        )
        ph2 = cbits * (pos >= start_sample)[:, None].astype(jnp.int32)
        contrib = ph1 + ph2 * cand[seg]
    else:
        contrib = cbits
    report = (
        jnp.zeros((n_reads_l, bits.shape[1]), dtype=jnp.int32)
        .at[seg]
        .add(contrib)
    )
    no_hits = (first_absent < BIG).astype(jnp.int32)
    return report, no_hits


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "wpad", "Rl", "W", "start_sample", "n_reads_l", "rpb",
    ),
)
def readid_batch_rowshard(
    matrix, rows, seg, pos, *, mesh, wpad, Rl, W, start_sample, n_reads_l,
    rpb=0,
):
    """query_readid_batch on a ("data","row") mesh: returns
    (report [nd*n_reads_l, W*32], no_hits [nd*n_reads_l])."""
    f = jax.shard_map(
        partial(_readid_row_body, wpad, Rl, W, start_sample, n_reads_l, rpb),
        mesh=mesh,
        in_specs=(
            P("row", None, None),
            P("data", None, None),
            P("data", None),
            P("data", None),
        ),
        out_specs=(P("data", None), P("data")),
        check_vma=False,
    )
    return f(matrix, rows, seg, pos)

# ---------------------------------------------------------------------------
# sharded read classifier: packed (device-hash) and first-hit variants
# ---------------------------------------------------------------------------


def _rows_from_packed(keys2, k, num_hash, bloom_size, rpb_place, bv):
    from ..ops.query import _device_rows

    return _device_rows(
        keys2[:, 0], keys2[:, 1], k, num_hash, bloom_size, rpb_place, bv
    )


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "wpad", "Wl", "start_sample", "n_reads_l", "rpb",
        "k", "num_hash", "bloom_size", "rpb_place", "bv",
    ),
)
def readid_batch_colorshard_packed(
    matrix, keys2, seg, pos, *, mesh, wpad, Wl, start_sample, n_reads_l,
    rpb, k, num_hash, bloom_size, rpb_place, bv,
):
    """readid_batch_colorshard with on-device hashing from 2-bit packed
    k-mers (engine.readid_counts_packed's 12B/k-mer contract on a mesh)."""

    def body(mat, keys2, seg, pos):
        rows = _rows_from_packed(
            keys2[0], k, num_hash, bloom_size, rpb_place, bv
        )
        return _readid_color_core(
            wpad, Wl, start_sample, n_reads_l, rpb, mat, rows, seg[0], pos[0]
        )

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("color", None, None),
            P("data", None, None),
            P("data", None),
            P("data", None),
        ),
        out_specs=(P("data", "color"), P("data")),
        check_vma=False,
    )
    return f(matrix, keys2, seg, pos)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "wpad", "Rl", "W", "start_sample", "n_reads_l", "rpb",
        "k", "num_hash", "bloom_size", "rpb_place", "bv",
    ),
)
def readid_batch_rowshard_packed(
    matrix, keys2, seg, pos, *, mesh, wpad, Rl, W, start_sample, n_reads_l,
    rpb, k, num_hash, bloom_size, rpb_place, bv,
):
    def body(mat, keys2, seg, pos):
        rows = _rows_from_packed(
            keys2[0], k, num_hash, bloom_size, rpb_place, bv
        )
        return _readid_row_core(
            wpad, Rl, W, start_sample, n_reads_l, rpb, mat, rows, seg[0],
            pos[0],
        )

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("row", None, None),
            P("data", None, None),
            P("data", None),
            P("data", None),
        ),
        out_specs=(P("data", None), P("data")),
        check_vma=False,
    )
    return f(matrix, keys2, seg, pos)


def _readid_fh_color_core(wpad, Wl, start_sample, n_reads_l, rpb, mat, rows,
                          seg, pos):
    """First-hit position per (read, local color slice) + first-absent —
    ops/query.py::query_readid_firsthit on a color shard. Presence (the
    break) is global over color; first hits are per-color, hence local."""
    g = _gather(mat[0], rows, wpad, rpb)[:, :, :Wl]
    present_l = (g != 0).any(axis=2)
    present = (
        jax.lax.psum(present_l.astype(jnp.int32), "color") > 0
    ).all(axis=1)
    BIG = jnp.int32(2**30)
    absent_pos = jnp.where(present, BIG, pos)
    first_absent = (
        jnp.full((n_reads_l,), BIG, dtype=jnp.int32).at[seg].min(absent_pos)
    )
    fa = first_absent[seg]
    counted = present & (pos < fa)
    andw = g[:, 0, :]
    for h in range(1, g.shape[1]):
        andw = andw & g[:, h, :]
    bits = _unpack_bits(andw)[:, : Wl * 32]
    ph1 = counted & (pos < start_sample) if start_sample > 0 else counted
    pos_hit = jnp.where((bits > 0) & ph1[:, None], pos[:, None], BIG)
    fh = (
        jnp.full((n_reads_l, bits.shape[1]), BIG, dtype=jnp.int32)
        .at[seg]
        .min(pos_hit)
    )
    return fh, first_absent


@partial(
    jax.jit,
    static_argnames=("mesh", "wpad", "Wl", "start_sample", "n_reads_l", "rpb"),
)
def readid_firsthit_colorshard(
    matrix, rows, seg, pos, *, mesh, wpad, Wl, start_sample, n_reads_l, rpb=0
):
    """query_readid_firsthit on a ("data","color") mesh: returns
    (fh [nd*n_reads_l, n_color*Wl*32], first_absent [nd*n_reads_l])."""

    def body(mat, rows, seg, pos):
        return _readid_fh_color_core(
            wpad, Wl, start_sample, n_reads_l, rpb, mat, rows[0], seg[0],
            pos[0],
        )

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("color", None, None),
            P("data", None, None),
            P("data", None),
            P("data", None),
        ),
        out_specs=(P("data", "color"), P("data")),
        check_vma=False,
    )
    return f(matrix, rows, seg, pos)


def _readid_fh_row_core(wpad, Rl, W, start_sample, n_reads_l, rpb, mat, rows,
                        seg, pos):
    lo = jax.lax.axis_index("row") * Rl
    local = rows - lo
    owned = (local >= 0) & (local < Rl)
    safe = jnp.clip(local, 0, Rl - 1)
    g = _gather(mat[0], safe, wpad, rpb)[:, :, :W]
    ones = jnp.uint32(0xFFFFFFFF)
    g = jnp.where(owned[:, :, None], g, ones)
    present_or_neutral = jnp.where(owned, (g != 0).any(axis=2), True)
    andw = g[:, 0, :]
    for h in range(1, g.shape[1]):
        andw = andw & g[:, h, :]
    ga = jax.lax.all_gather(andw, "row")
    andw = jax.lax.reduce(ga, ones, jax.lax.bitwise_and, dimensions=(0,))
    present = (
        jax.lax.psum(present_or_neutral.astype(jnp.int32), "row")
        == jax.lax.axis_size("row")
    ).all(axis=1)
    BIG = jnp.int32(2**30)
    absent_pos = jnp.where(present, BIG, pos)
    first_absent = (
        jnp.full((n_reads_l,), BIG, dtype=jnp.int32).at[seg].min(absent_pos)
    )
    fa = first_absent[seg]
    counted = present & (pos < fa)
    bits = _unpack_bits(andw)[:, : W * 32]
    ph1 = counted & (pos < start_sample) if start_sample > 0 else counted
    pos_hit = jnp.where((bits > 0) & ph1[:, None], pos[:, None], BIG)
    fh = (
        jnp.full((n_reads_l, bits.shape[1]), BIG, dtype=jnp.int32)
        .at[seg]
        .min(pos_hit)
    )
    return fh, first_absent


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "wpad", "Rl", "W", "start_sample", "n_reads_l", "rpb",
    ),
)
def readid_firsthit_rowshard(
    matrix, rows, seg, pos, *, mesh, wpad, Rl, W, start_sample, n_reads_l,
    rpb=0,
):
    """query_readid_firsthit on a ("data","row") mesh: returns
    (fh [nd*n_reads_l, W*32], first_absent [nd*n_reads_l])."""

    def body(mat, rows, seg, pos):
        return _readid_fh_row_core(
            wpad, Rl, W, start_sample, n_reads_l, rpb, mat, rows[0], seg[0],
            pos[0],
        )

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("row", None, None),
            P("data", None, None),
            P("data", None),
            P("data", None),
        ),
        out_specs=(P("data", None), P("data")),
        check_vma=False,
    )
    return f(matrix, rows, seg, pos)
