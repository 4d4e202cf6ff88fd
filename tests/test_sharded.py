"""Sharded query kernels vs the single-device kernel on an 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from colorid_tpu.ops.query import pack_matrix_blocks, query_batch
from colorid_tpu.parallel import sharded


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    R, W, H, N = 4096, 4, 4, 2048
    matrix = rng.integers(0, 2**32, (R, W), dtype=np.uint32)
    # make some rows absent (all-zero) and leave headroom colors zero
    matrix[rng.integers(0, R, 500)] = 0
    rows = rng.integers(0, R, (N, H)).astype(np.int32)
    mask = np.ones(N, dtype=bool)
    mask[-37:] = False
    return matrix, rows, mask


@pytest.fixture(scope="module")
def want(problem):
    matrix, rows, mask = problem
    import jax.numpy as jnp

    blocks, wpad = pack_matrix_blocks(matrix)
    c, u, v, aa, av = query_batch(
        jnp.asarray(blocks), jnp.asarray(rows), jnp.asarray(mask), wpad=wpad
    )
    return (
        np.asarray(c),
        np.asarray(u),
        np.asarray(v),
        np.asarray(aa),
        bool(av),
    )


@pytest.mark.parametrize("nd,nm", [(2, 4), (1, 8), (4, 2)])
def test_colorshard_matches(problem, want, nd, nm):
    if len(jax.devices()) < nd * nm:
        pytest.skip("not enough devices")
    matrix, rows, mask = problem
    mesh = sharded.make_mesh(nd, nm, "color")
    mat, wpad, Wl = sharded.device_put_colorshard(matrix, mesh)
    c, u, v, aa, av = sharded.query_batch_colorshard(
        mat, rows, mask, mesh=mesh, wpad=wpad, Wl=Wl
    )
    C = matrix.shape[1] * 32
    # counts come back per color shard of Wl words: reassemble
    cc = np.asarray(c).reshape(nm, -1)[:, : Wl * 32].reshape(-1)[:C]
    np.testing.assert_array_equal(cc, want[0][:C])
    np.testing.assert_array_equal(np.asarray(u), want[1])
    np.testing.assert_array_equal(np.asarray(v), want[2])
    aw = np.asarray(aa).reshape(nm, -1)[:, :Wl].reshape(-1)[: matrix.shape[1]]
    np.testing.assert_array_equal(aw, want[3])
    assert bool(av) == want[4]


@pytest.mark.parametrize("nd,nm", [(2, 4), (1, 8), (4, 2)])
def test_rowshard_matches(problem, want, nd, nm):
    if len(jax.devices()) < nd * nm:
        pytest.skip("not enough devices")
    matrix, rows, mask = problem
    mesh = sharded.make_mesh(nd, nm, "row")
    mat, wpad, Rl = sharded.device_put_rowshard(matrix, mesh)
    c, u, v, aa, av = sharded.query_batch_rowshard(
        mat, rows, mask, mesh=mesh, wpad=wpad, Rl=Rl, W=matrix.shape[1]
    )
    np.testing.assert_array_equal(np.asarray(c)[: want[0].shape[0]], want[0])
    np.testing.assert_array_equal(np.asarray(u), want[1])
    np.testing.assert_array_equal(np.asarray(v), want[2])
    np.testing.assert_array_equal(np.asarray(aa), want[3])
    assert bool(av) == want[4]
