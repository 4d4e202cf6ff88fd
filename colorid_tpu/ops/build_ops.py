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
