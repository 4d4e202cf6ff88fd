"""Amortized stage decomposition of the fused v3 path at full bench scale.

    python -u tools/profile_r3e.py [n_reads_thousands]
"""

import os
import pickle
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".bench_cache", "jaxcache")
)
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

K, L = 31, 150
R = int(float(sys.argv[1]) * 1000) if len(sys.argv) > 1 else 400_000
NW = L - K + 1
N = R * NW


def amort(name, fn, args, reps=8):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<28} {dt*1e3:8.2f} ms  ({N/dt/1e6:6.1f} M win/s)", flush=True)
    return out


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print(f"device: {jax.devices()[0]}, R={R}", flush=True)

    from colorid_tpu.engine import QueryEngine
    from colorid_tpu.ops import extract as E
    from colorid_tpu.ops.fused_reads import SENT
    from colorid_tpu.ops.hash_jax import _v3_blkoff
    from colorid_tpu.ops.stream_query import PC, _stream_call, pack_offsets

    with open(os.path.join(ROOT, ".bench_cache", "prof_v3_idx.pkl"), "rb") as f:
        index = pickle.load(f)
    engine = QueryEngine(index, chunk=1 << 21)
    rng = np.random.default_rng(0)
    reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(R, L))
    packed = jax.device_put(E.pack_reads(reads))
    lens = jax.device_put(np.full(R, L, dtype=np.int32))
    np.asarray(jnp.sum(packed))
    np.asarray(jnp.sum(engine.blocks2[:1]))  # force matrix H2D
    np.asarray(jnp.sum(engine._blocks_bp[:1]))
    P = N + ((-N) % PC)
    rpb, bloom, H, C = (
        engine.rpb, index.bloom_size, index.num_hash, index.n_colors,
    )

    @jax.jit
    def s_limbs(p, ln):
        codes = E._unpack_codes(p, L)
        lo, hi = E._window_limbs(codes, K, NW)
        w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
        valid = w_idx + K <= ln[:, None]
        lo = jnp.where(valid, lo, SENT).reshape(-1)
        hi = jnp.where(valid, hi, SENT).reshape(-1)
        pad = P - N
        if pad:
            lo = jnp.concatenate([lo, jnp.full(pad, SENT)])
            hi = jnp.concatenate([hi, jnp.full(pad, SENT)])
        return lo, hi

    @jax.jit
    def s_sort(lo, hi):
        return jax.lax.sort((hi, lo), num_keys=2)

    @jax.jit
    def s_count(s_hi, s_lo):
        iota = jnp.arange(P, dtype=jnp.int32)
        new = (iota == 0) | (s_hi != jnp.roll(s_hi, 1)) | (
            s_lo != jnp.roll(s_lo, 1)
        )
        starts = jnp.where(new, iota, np.int32(P))
        suffix_min = jax.lax.cummin(starts, axis=0, reverse=True)
        next_start = jnp.concatenate(
            [suffix_min[1:], jnp.full((1,), P, dtype=jnp.int32)]
        )
        count = next_start - iota
        keep = new & ~((s_hi == SENT) & (s_lo == SENT)) & (count > 1)
        return jnp.where(keep, count, 0)

    @jax.jit
    def s_blkoff(s_lo, s_hi):
        blk, offs = _v3_blkoff(s_lo, s_hi, K, H, bloom, rpb)
        return blk, pack_offsets(offs)

    @jax.jit
    def s_kernel(blk, offp, qc):
        n_tiles = engine.blocks2.shape[0] // 128
        n_chunks = P // PC
        firsts = blk.reshape(n_chunks, PC)[:, 0]
        tb = jnp.clip(firsts // 128, 0, n_tiles - 2).astype(jnp.int32)
        inwin = (blk.reshape(n_chunks, PC) - tb[:, None] * 128 < 256).reshape(-1)
        qcw = jnp.where(inwin, qc, 0)
        uniq, counts_out, hist_out = _stream_call(
            engine._blocks_bp, blk, offp, qcw, tb,
            num_hash=H, wpad=engine.wpad, n_colors=C, cp=32,
        )
        return counts_out

    t0 = time.time()
    lo, hi = amort("limbs (stage compile incl)", s_limbs, (packed, lens), reps=4)
    s_hi, s_lo = amort("sort 2-key", s_sort, (lo, hi), reps=4)
    qc = amort("group counts", s_count, (s_hi, s_lo), reps=4)
    blk, offp = amort("v3 blkoff", s_blkoff, (s_lo, s_hi), reps=4)
    amort("stream kernel", s_kernel, (blk, offp, qc), reps=4)
    print(f"stage total wall (incl compiles): {time.time()-t0:.1f}s", flush=True)

    # full engine trial for reference (includes H2D + D2H)
    res, n_u = engine.search_reads(packed, lens, k=K, L=L, filter_t=1)
    for t in range(3):
        t0 = time.time()
        res, n_u = engine.search_reads(packed, lens, k=K, L=L, filter_t=1)
        dt = time.time() - t0
        print(f"engine trial {t}: {dt:.3f}s -> {n_u/dt/1e6:.2f} M kmers/s",
              flush=True)


if __name__ == "__main__":
    main()
