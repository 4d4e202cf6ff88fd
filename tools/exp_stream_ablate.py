"""Ablate the sorted-stream kernel stage by stage on the real chip.

Copies the kernel with a `stage` knob:
  0 = tile streaming only (empty body)
  1 = + one-hot row-select matmuls
  2 = + lane-gather word extraction
  3 = + presence/AND trees
  4 = + counts unpack/accumulate + uniq
  5 = + histogram (full kernel)

    python tools/exp_stream_ablate.py [N_millions] [PC]
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_cache", "jaxcache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, BLOOM, H, C = 31, 50_000_000, 4, 21
W = 1
HIST_W = 256
T = 128
N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_194_304
PC = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
N = ((N + PC - 1) // PC) * PC
_DEOFFSET = np.int32(np.uint32(0x80808080).astype(np.int64) - (1 << 32))

_RTT = [0.0]


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def bench(name, fn, *args, reps=3, inner=6):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0 - _RTT[0]) / inner)
    print(f"{name:<52} {max(best,1e-9)*1e3:8.2f} ms   {N/max(best,1e-9)/1e6:9.1f} M/s")
    return best


def _lg(x, idx):
    return jnp.take_along_axis(x, idx, axis=1)


def kernel(tb_ref, blk_ref, off_ref, qc_ref, tileA_ref, tileB_ref,
           uniq_ref, counts_ref, hist_ref, misc_ref, counts_scratch,
           *, stage, cp, n_chunks):
    HW = H * W
    CW = 32 * W
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        counts_scratch[:] = jnp.zeros_like(counts_scratch)
        hist_ref[:] = jnp.zeros_like(hist_ref)
        misc_ref[:] = jnp.full_like(misc_ref, -1)

    if stage == 0:
        uniq_ref[:] = blk_ref[:]
        return
    base = tb_ref[j] * T
    l2 = (blk_ref[:] - base)[:, None]
    iota_T = jax.lax.broadcasted_iota(jnp.int32, (PC, T), 1)
    ohA = (l2 == iota_T).astype(jnp.int8)
    ohB = ((l2 - T) == iota_T).astype(jnp.int8)
    g = jax.lax.dot_general(ohA, tileA_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    g = g + jax.lax.dot_general(ohB, tileB_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    if stage == 1:
        uniq_ref[:] = g[:, 0]
        return
    li = jax.lax.broadcasted_iota(jnp.int32, (PC, 128), 1)
    offw = off_ref[:][:, None].astype(jnp.uint32)
    h_of = jnp.minimum(li // W, H - 1)
    off_j = (offw >> (8 * h_of).astype(jnp.uint32)) & jnp.uint32(0xFF)
    idx = off_j.astype(jnp.int32) * W + (li % W)
    idx = jnp.where(li < HW, idx, 0)
    b0 = _lg(g[:, 0:128], idx)
    b1 = _lg(g[:, 128:256], idx)
    b2 = _lg(g[:, 256:384], idx)
    b3 = _lg(g[:, 384:512], idx)
    words = b0 + b1 * 256 + b2 * 65536 + b3 * 16777216 + _DEOFFSET
    if stage == 2:
        uniq_ref[:] = words[:, 0]
        return
    nz = (words != 0).astype(jnp.int32)
    step = W // 2
    while step >= 1:
        nz = nz | _lg(nz, jnp.minimum(li + step, 127))
        step //= 2
    ph = _lg(nz, jnp.minimum(li * W, 127))
    step = H // 2
    while step >= 1:
        ph = ph & _lg(ph, jnp.minimum(li + step, 127))
        step //= 2
    valid = _lg(ph, jnp.zeros_like(li))
    x = words
    step = W * (H // 2)
    while step >= W:
        x = x & _lg(x, jnp.minimum(li + step, 127))
        step //= 2
    if stage == 3:
        uniq_ref[:] = x[:, 0] + valid[:, 0]
        return
    qc = qc_ref[:].astype(jnp.int32)
    realm = qc > 0
    realm_i = realm.astype(jnp.int32)
    vrow = valid[:, 0] * realm_i
    rep = _lg(x, jnp.minimum(li // 32, W - 1))
    bits = (rep >> (li % 32)) & 1
    mi = valid * realm_i[:, None] * (li < CW).astype(jnp.int32)
    vbits = bits * mi
    counts_scratch[:] = counts_scratch[:] + vbits
    nhits = jnp.sum(vbits, axis=1)
    colorsum = jnp.sum(vbits * li, axis=1)
    uniq = (vrow == 1) & (nhits == 1)
    uniq_ref[:] = jnp.where(uniq, colorsum, -1)
    if stage == 4:
        return
    qclip = jnp.clip(qc, 0, HIST_W - 1)
    small = uniq & (qc < HIST_W)
    if stage in (5, 7):
        hist_col = jnp.where(small, colorsum, C)[:, None]
        oc = (hist_col == jax.lax.broadcasted_iota(jnp.int32, (PC, cp), 1)
              ).astype(jnp.int8)
        ov = (qclip[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (PC, HIST_W), 1)).astype(jnp.int8)
        delta = jax.lax.dot_general(
            oc, ov, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        hist_ref[:] = hist_ref[:] + delta
    if stage in (6, 8):
        # transposed one-hot built directly; natural-form MXU contraction
        hist_colr = jnp.where(small, colorsum, C)[None, :]
        ocT = (hist_colr == jax.lax.broadcasted_iota(
            jnp.int32, (cp, PC), 0)).astype(jnp.int8)
        ov = (qclip[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (PC, HIST_W), 1)).astype(jnp.int8)
        delta = jax.lax.dot_general(
            ocT, ov, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        hist_ref[:] = hist_ref[:] + delta
    if stage in (5, 6):
        @pl.when(j == n_chunks - 1)
        def _f2():
            counts_ref[0, :] = jnp.sum(counts_scratch[:], axis=0)
        return
    vb = vrow == 1
    for w in range(W):
        misc_ref[w, :] = misc_ref[w, :] & jnp.where(vb, x[:, w], -1)
    misc_ref[W, :] = misc_ref[W, :] & ((valid[:, 0] == 1) | ~realm
                                       ).astype(jnp.int32)

    @pl.when(j == n_chunks - 1)
    def _final():
        counts_ref[0, :] = jnp.sum(counts_scratch[:], axis=0)


@partial(jax.jit, static_argnames=("stage", "cp"))
def call(blocks_bp, blk_s, off_s, qc_s, tb, *, stage, cp):
    P = blk_s.shape[0]
    n_chunks = P // PC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((T, 512), lambda j, tb: (tb[j], 0)),
            pl.BlockSpec((T, 512), lambda j, tb: (tb[j] + 1, 0)),
        ],
        out_specs=(
            pl.BlockSpec((PC,), lambda j, tb: (j,)),
            pl.BlockSpec((8, 128), lambda j, tb: (0, 0)),
            pl.BlockSpec((cp, HIST_W), lambda j, tb: (0, 0)),
            pl.BlockSpec((8, PC), lambda j, tb: (0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((PC, 128), jnp.int32)],
    )
    return pl.pallas_call(
        partial(kernel, stage=stage, cp=cp, n_chunks=n_chunks),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((P,), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
            jax.ShapeDtypeStruct((cp, HIST_W), jnp.int32),
            jax.ShapeDtypeStruct((8, PC), jnp.int32),
        ),
    )(tb, blk_s, off_s, qc_s, blocks_bp, blocks_bp)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}, N={N/1e6:.1f}M probes, PC={PC}")
    rpb = 128 // W
    n_blocks = BLOOM // rpb
    n_rows = ((BLOOM * W + T * 128 - 1) // (T * 128)) * T
    bp = jax.device_put(
        rng.integers(-128, 128, (n_rows, 512), dtype=np.int8))
    blk = np.sort(rng.integers(0, n_blocks, N).astype(np.int32))
    off = rng.integers(0, 2**32, N, dtype=np.uint32)
    qc = np.ones(N, dtype=np.int32)
    tb_h = np.clip(blk.reshape(-1, PC)[:, 0] // T, 0, n_rows // T - 2
                   ).astype(np.int32)
    inwin = (blk.reshape(-1, PC) - tb_h[:, None] * T < 2 * T).reshape(-1)
    qc = np.where(inwin, qc, 0)
    blk_d, off_d, qc_d, tb_d = map(jax.device_put, (blk, off, qc, tb_h))
    _sync(blk_d)
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        _sync(blk_d)
        best = min(best, time.perf_counter() - t0)
    _RTT[0] = best
    print(f"RTT {best*1e3:.1f} ms; oow frac {1-inwin.mean():.4f}")
    cp = 32 if C < 32 else 128
    names = ["tiles only", "+row-select matmul", "+lane extract",
             "+presence/AND", "+counts/uniq", "+hist transposed-dot",
             "+hist natural-dot", "+hist T + misc (full)",
             "+hist N + misc (full)"]
    for st in range(9):
        bench(f"stage {st}: {names[st]}",
              lambda s=st: call(bp, blk_d, off_d, qc_d, tb_d, stage=s, cp=cp))


if __name__ == "__main__":
    main()
