"""Device-side index construction: the scatter-OR kernel.

The reference builds per-accession Bloom filters then transposes by scanning
every Bloom row across all filters (build.rs:167-244). The dense TPU layout
needs no transpose: each accession's hashed rows are scattered into a
boolean presence vector and OR-packed into its color's bit position of the
packed uint32 column word — one donated in-place update per accession, all
in device HBM.

For multi-host builds, accessions (columns) partition across hosts and each
host builds its word-group slice [R, W/hosts] independently — no
communication at all (color-sharded build); a row-sharded build instead
scatters only locally-owned rows per device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0,))
def scatter_or_column(
    acc: jnp.ndarray,  # uint32 [R] packed word column (donated)
    rows: jnp.ndarray,  # int32 [M] bloom-row indices (pad with R => dropped)
    bit: jnp.ndarray,  # int32 [] bit position of this accession (0..31)
):
    R = acc.shape[0]
    present = jnp.zeros(R, dtype=jnp.bool_).at[rows].set(True, mode="drop")
    return acc | (present.astype(jnp.uint32) << bit.astype(jnp.uint32))


@partial(jax.jit, donate_argnums=(0,), static_argnames=("Rl", "mesh"))
def _scatter_rowshard(out, rows, w, bit, *, Rl, mesh):
    """One accession's rows OR-ed into the row-sharded matrix: each device
    scatters only the rows it owns ([lo, lo+Rl)); everything else drops."""
    from jax.sharding import PartitionSpec as P

    def body(o, r, w_, b_):
        lo = jax.lax.axis_index("row").astype(jnp.int32) * np.int32(Rl)
        loc = r - lo
        idx = jnp.where((loc >= 0) & (loc < Rl), loc, Rl)
        present = jnp.zeros((Rl,), jnp.bool_).at[idx].set(True, mode="drop")
        col = jax.lax.dynamic_slice(o, (jnp.int32(0), w_), (Rl, 1))[:, 0]
        col = col | (present.astype(jnp.uint32) << b_)
        return jax.lax.dynamic_update_slice(o, col[:, None], (jnp.int32(0), w_))

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("row", None), P(), P(), P()),
        out_specs=P("row", None),
        check_vma=False,
    )(out, rows, w, bit)


def build_matrix_rowshard(
    row_lists: list[np.ndarray],
    bloom_size: int,
    mesh,
    pad_to: int = 1 << 20,
):
    """Row-sharded build for indexes beyond one device's HBM: the matrix is
    born sharded along the Bloom-row axis of ``mesh`` (spec P("row", None))
    and the full [bloom_size, W] array never exists on any single device or
    on the host. Each accession's hashed rows broadcast to every device;
    each device scatter-ORs only its locally owned range (the TPU analogue
    of the reference's per-row transpose scan, build.rs:233-244).

    Returns (matrix [Rl*n, W] jax array sharded over "row", Rl).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["row"]
    C = len(row_lists)
    W = (C + 31) // 32
    Rl = -(-bloom_size // n)
    Rpad = Rl * n
    sh = NamedSharding(mesh, P("row", None))
    out = jax.jit(
        lambda: jnp.zeros((Rpad, W), jnp.uint32), out_shardings=sh
    )()
    for c, rl in enumerate(row_lists):
        rows = np.asarray(rl).ravel().astype(np.int32)
        m = rows.shape[0]
        size = max(pad_to, 1 << (max(m, 1) - 1).bit_length())
        padded = np.full(size, Rpad, dtype=np.int32)  # out of range: dropped
        padded[:m] = rows
        out = _scatter_rowshard(
            out, jnp.asarray(padded), jnp.int32(c // 32), jnp.uint32(c % 32),
            Rl=Rl, mesh=mesh,
        )
    return out, Rl


@partial(jax.jit, static_argnames=("mesh", "Rl", "W"))
def pack_blocks_rowshard(mat, *, mesh, Rl, W):
    """Pack a row-sharded [Rl*n, W] matrix into the block-gather layout
    shard-locally (equivalent to device_put_rowshard on the gathered matrix,
    without ever gathering it). Returns blocks [n, nb, 128] P("row",·,·)."""
    from jax.sharding import PartitionSpec as P

    from .query import row_wpad

    wpad = row_wpad(W)
    # min 512 matches pack_matrix_blocks (NT_WIN stream window tiles)
    nb = max((-(-(Rl * wpad) // (128 * 128))) * 128, 512)
    cap = -(-(nb * 128) // wpad)

    def body(m):  # [Rl, W] local shard
        mp = jnp.zeros((cap, wpad), jnp.uint32).at[:Rl, :W].set(m)
        return mp.reshape(-1)[: nb * 128].reshape(1, nb, 128)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("row", None),),
        out_specs=P("row", None, None),
        check_vma=False,
    )(mat)


def build_matrix_device(
    row_lists: list[np.ndarray],
    bloom_size: int,
    pad_to: int = 1 << 20,
) -> jnp.ndarray:
    """Build the [bloom_size, W] matrix on device from per-accession row
    indices (accession i = color i). Returns the device array."""
    C = len(row_lists)
    W = (C + 31) // 32
    cols = []
    for w in range(W):
        acc = jnp.zeros(bloom_size, dtype=jnp.uint32)
        for bit in range(32):
            c = w * 32 + bit
            if c >= C:
                break
            rows = np.asarray(row_lists[c]).ravel().astype(np.int32)
            # pad to a bounded set of shapes to limit jit cache entries
            m = rows.shape[0]
            size = max(pad_to, 1 << (max(m, 1) - 1).bit_length())
            padded = np.full(size, bloom_size, dtype=np.int32)  # drop slot
            padded[:m] = rows
            acc = scatter_or_column(acc, jnp.asarray(padded), jnp.int32(bit))
        cols.append(acc)
    return jnp.stack(cols, axis=1)
