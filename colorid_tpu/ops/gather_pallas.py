"""Pallas TPU kernel: sorted-probe gather by streaming the matrix through VMEM.

XLA's row gather on TPU lowers to a serial scalar fetch loop (~1M random
probes/s on v5e, ~35M/s sorted, ~75M/s for 512B blocks). The BIGSI hot loop
needs billions of random 4-byte row reads per second, so the access is
restructured:

1. probes are sorted once (TPU sort is fast and carries payload);
2. the kernel walks the sorted probe list in fixed chunks while the Pallas
   pipeline DMA-streams the covering matrix tiles HBM→VMEM sequentially at
   full bandwidth (scalar-prefetched per-chunk tile ids drive the schedule);
3. each chunk resolves its probes against the resident tile with two fully
   vectorized `tpu.dynamic_gather`s (via take_along_axis): a sublane gather
   pulls each probe's 128-lane block, a lane one-hot select extracts the
   word. No scalar loads, no dynamic stores.

Contract: gather_sorted(matrix_flat[Rp], probes_sorted[P]) ==
matrix_flat[probes] for ascending probes; a chunk's probes must span less
than TILE_ROWS rows (guaranteed by the caller, see engine spans check).

Reference behavior replaced: per-k-mer BitVec row fetch
(batch_search_pe.rs:45-56, read_id_mt_pe.rs:76-85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_SUB = 2048  # sublanes per tile -> TILE_ROWS flat words, 1MB VMEM
TILE_ROWS = TILE_SUB * LANES  # 262144 words covered per tile
CHUNK = 2048  # probes resolved per grid step


def _kernel(base_ref, idx_ref, a_ref, b_ref, out_ref):
    c = pl.program_id(0)
    base_word = base_ref[c] * TILE_ROWS
    idx = idx_ref[:, :] - base_word  # [S, LANES] words into the tile pair
    sub = idx // LANES  # 0 .. 2*TILE_SUB
    lane = jnp.remainder(idx, LANES)
    in_a = sub < TILE_SUB
    sub_a = jnp.clip(sub, 0, TILE_SUB - 1)
    sub_b = jnp.clip(sub - TILE_SUB, 0, TILE_SUB - 1)

    def pull(tile_ref, sub2):
        # one probe per (row, lane) slot; vectorized sublane gather pulls
        # the probe's block value at this slot's lane:
        # g[i, j] = tile[sub2[i, j], j]
        return jnp.take_along_axis(
            tile_ref[:, :], sub2, axis=0, mode="promise_in_bounds"
        )

    ga = pull(a_ref, sub_a)
    gb = pull(b_ref, sub_b)
    g = jnp.where(in_a, ga, gb)  # [S, LANES]
    # lane select: v[i, j] = g[i, lane[i, j]]
    out_ref[:, :] = jnp.take_along_axis(g, lane, axis=1, mode="promise_in_bounds")


def _padded_chunk_bases(probes: jnp.ndarray, n_tiles: int) -> jnp.ndarray:
    return jnp.minimum(
        probes[::CHUNK] // TILE_ROWS, np.int32(max(n_tiles - 2, 0))
    ).astype(jnp.int32)


@jax.jit
def gather_sorted(matrix_flat: jnp.ndarray, probes: jnp.ndarray):
    """matrix_flat [Rp] uint32 (Rp multiple of TILE_ROWS, with one guard
    tile), probes [P] int32 ascending (P multiple of CHUNK). Returns [P]."""
    P = probes.shape[0]
    n_chunks = P // CHUNK
    n_tiles = matrix_flat.shape[0] // TILE_ROWS
    base = _padded_chunk_bases(probes, n_tiles)
    S = CHUNK // LANES
    m2 = matrix_flat.reshape(n_tiles * TILE_SUB, LANES)
    p2 = probes.reshape(n_chunks * S, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (S, LANES), lambda c, base: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_SUB, LANES),
                lambda c, base: (base[c], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_SUB, LANES),
                lambda c, base: (base[c] + 1, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (S, LANES), lambda c, base: (c, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks * S, LANES), jnp.uint32),
    )(base, p2, m2, m2)
    return out.reshape(P)


def pad_matrix_tiles(matrix_flat: np.ndarray) -> np.ndarray:
    """Pad the flat word array to a multiple of TILE_ROWS plus one guard
    tile (the kernel touches tile base+1 unconditionally)."""
    R = matrix_flat.shape[0]
    Rp = ((R + TILE_ROWS - 1) // TILE_ROWS + 1) * TILE_ROWS
    if Rp == R:
        return matrix_flat
    out = np.zeros(Rp, dtype=matrix_flat.dtype)
    out[:R] = matrix_flat
    return out


def max_chunk_span(probes_sorted: np.ndarray) -> int:
    """Largest row span of any CHUNK-sized probe chunk (host-side check)."""
    P = probes_sorted.shape[0]
    if P == 0:
        return 0
    n_chunks = P // CHUNK
    if n_chunks == 0:
        return int(probes_sorted[-1] - probes_sorted[0])
    first = probes_sorted[: n_chunks * CHUNK : CHUNK]
    last = probes_sorted[CHUNK - 1 :: CHUNK][:n_chunks]
    return int((last - first).max())
