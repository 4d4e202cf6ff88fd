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


def device_put_rowshard(matrix: np.ndarray, mesh: Mesh):
    """Split the Bloom-row axis across shards; pack each shard. Returns
    (blocks [n_shards, nb, 128] sharded, wpad, rows_per_shard)."""
    n = mesh.shape["row"]
    R, W = matrix.shape
    Rl = -(-R // n)
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


def _colorshard_body(wpad, Wl, mat, rows, mask):
    """Per-device body. mat: [1, nb, 128]; rows: [Nl, H]; mask: [Nl]."""
    g = _gather_rows(mat[0], rows, wpad)[:, :, :Wl]  # [Nl, H, Wl]
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


@partial(jax.jit, static_argnames=("mesh", "wpad", "Wl"))
def query_batch_colorshard(matrix, rows, mask, *, mesh, wpad, Wl):
    """Same contract as ops.query.query_batch on a ("data","color") mesh;
    counts/and_all are concatenated over color shards (width n*Wl words)."""
    f = jax.shard_map(
        partial(_colorshard_body, wpad, Wl),
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


def _rowshard_body(wpad, Rl, W, mat, rows, mask):
    """mat: [1, nb, 128] covering rows [lo, lo+Rl); rows: [Nl, H]."""
    lo = jax.lax.axis_index("row") * Rl
    local = rows - lo
    owned = (local >= 0) & (local < Rl)
    safe = jnp.clip(local, 0, Rl - 1)
    g = _gather_rows(mat[0], safe, wpad)[:, :, :W]  # [Nl, H, W]
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


@partial(jax.jit, static_argnames=("mesh", "wpad", "Rl", "W"))
def query_batch_rowshard(matrix, rows, mask, *, mesh, wpad, Rl, W):
    """Same contract as ops.query.query_batch on a ("data","row") mesh."""
    f = jax.shard_map(
        partial(_rowshard_body, wpad, Rl, W),
        mesh=mesh,
        in_specs=(P("row", None, None), P("data", None), P("data")),
        out_specs=(P(), P("data"), P("data"), P(), P()),
        check_vma=False,
    )
    return f(matrix, rows, mask)