"""Engine trials with batched D2H + stream-kernel PC sweep at 400k reads.

    python -u tools/profile_r3f.py
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
R = 400_000
NW = L - K + 1
N = R * NW


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print(f"device: {jax.devices()[0]}", flush=True)

    from colorid_tpu.engine import QueryEngine
    from colorid_tpu.ops import extract as E
    from colorid_tpu.ops import stream_query as SQ
    from colorid_tpu.ops.hash_jax import _v3_blkoff

    with open(os.path.join(ROOT, ".bench_cache", "prof_v3_idx.pkl"), "rb") as f:
        index = pickle.load(f)
    engine = QueryEngine(index, chunk=1 << 21)
    rng = np.random.default_rng(0)
    reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(R, L))
    packed_h = E.pack_reads(reads)
    packed = jax.device_put(packed_h)
    lens_h = np.full(R, L, dtype=np.int32)
    np.asarray(jnp.sum(packed))
    np.asarray(jnp.sum(engine.blocks2[:1]))
    np.asarray(jnp.sum(engine._blocks_bp[:1]))

    # engine trials, device-resident reads (new batched D2H)
    res, n_u = engine.search_reads(packed, lens_h, k=K, L=L, filter_t=1)
    for t in range(3):
        t0 = time.time()
        res, n_u = engine.search_reads(packed, lens_h, k=K, L=L, filter_t=1)
        dt = time.time() - t0
        print(f"engine trial (dev-resident) {t}: {dt:.3f}s -> "
              f"{n_u/dt/1e6:.2f} M kmers/s", flush=True)
    # engine trials, host reads (includes H2D each call, = bench condition)
    for t in range(2):
        t0 = time.time()
        res, n_u = engine.search_reads(packed_h, lens_h, k=K, L=L, filter_t=1)
        dt = time.time() - t0
        print(f"engine trial (host reads)   {t}: {dt:.3f}s -> "
              f"{n_u/dt/1e6:.2f} M kmers/s", flush=True)

    # PC sweep on the kernel alone
    rpb, bloom, H, C = (
        engine.rpb, index.bloom_size, index.num_hash, index.n_colors,
    )

    @jax.jit
    def prep(p, ln):
        codes = E._unpack_codes(p, L)
        lo, hi = E._window_limbs(codes, K, NW)
        w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
        valid = w_idx + K <= ln[:, None]
        SENT = jnp.uint32(0xFFFFFFFF)
        lo = jnp.where(valid, lo, SENT).reshape(-1)
        hi = jnp.where(valid, hi, SENT).reshape(-1)
        pad = ((-N) % 4096)
        if pad:
            lo = jnp.concatenate([lo, jnp.full(pad, SENT)])
            hi = jnp.concatenate([hi, jnp.full(pad, SENT)])
        s_hi, s_lo = jax.lax.sort((hi, lo), num_keys=2)
        P = N + pad
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
        qc = jnp.where(keep, count, 0)
        blk, offs = _v3_blkoff(s_lo, s_hi, K, H, bloom, rpb)
        return blk, SQ.pack_offsets(offs), qc

    lens_d = jax.device_put(lens_h)
    blk, offp, qc = prep(packed, lens_d)
    np.asarray(blk[:1])
    P = blk.shape[0]
    n_tiles = engine.blocks2.shape[0] // 128

    for PC_TRY in (1024, 2048, 4096):
        SQ.PC = PC_TRY

        @jax.jit
        def s_kernel(blk, offp, qc):
            n_chunks = P // PC_TRY
            firsts = blk.reshape(n_chunks, PC_TRY)[:, 0]
            tb = jnp.clip(firsts // 128, 0, n_tiles - 2).astype(jnp.int32)
            inwin = (
                blk.reshape(n_chunks, PC_TRY) - tb[:, None] * 128 < 256
            ).reshape(-1)
            qcw = jnp.where(inwin, qc, 0)
            uniq, counts_out, hist_out = SQ._stream_call(
                engine._blocks_bp, blk, offp, qcw, tb,
                num_hash=H, wpad=engine.wpad, n_colors=C, cp=32,
            )
            return counts_out

        t0 = time.time()
        out = s_kernel(blk, offp, qc)
        np.asarray(out[:1, :1])
        print(f"PC={PC_TRY}: compile+first {time.time()-t0:.1f}s", flush=True)
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out = s_kernel(blk, offp, qc)
        np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / reps
        print(f"PC={PC_TRY}: kernel {dt*1e3:8.2f} ms ({N/dt/1e6:6.1f} M "
              f"probes/s)", flush=True)
    SQ.PC = 1024


if __name__ == "__main__":
    main()
