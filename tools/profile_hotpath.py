"""Decompose the blocked-query kernel cost on the real chip.

Times each stage of the hot loop in isolation on device-resident inputs:
hash, gather, epilogue pieces, and the full fused kernels — so kernel work
targets the measured dominant term instead of guesses. Run on the TPU:

    python tools/profile_hotpath.py [N_kmers_millions]
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_cache", "jaxcache"),
)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, BLOOM, HASHES, COLORS = 31, 50_000_000, 4, 21
N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_194_304
N = ((N + (1 << 20) - 1) >> 20) << 20  # multiple of 1M (chunk-friendly)


_RTT = [0.0]


def _sync(out):
    """Force completion: block_until_ready does NOT synchronize through the
    axon tunnel; a tiny D2H read does."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def measure_rtt(x):
    """Tunnel D2H round-trip on an already-materialized array (subtracted
    from timings)."""
    _sync(x)
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(x)
        best = min(best, time.perf_counter() - t0)
    _RTT[0] = best
    print(f"tunnel D2H RTT: {best*1e3:.1f} ms (subtracted per rep)")


def bench(name, fn, *args, reps=4, inner=6):
    out = fn(*args)  # compile+warm
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0 - _RTT[0]) / inner
        best = min(best, dt)
    best = max(best, 1e-9)
    rate = N / best / 1e6
    print(f"{name:<46} {best*1e3:8.2f} ms   {rate:9.1f} M/s")
    return best


def main():
    from colorid_tpu.ops import query as Q
    from colorid_tpu.ops.hash_jax import _limbs_from_packed

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}, N = {N/1e6:.1f}M k-mers")

    wpad = 1
    rpb = 128
    n_rows = ((BLOOM * wpad + 128 * 128 - 1) // (128 * 128)) * 128
    blocks2 = jax.device_put(
        rng.integers(0, 2**32, (n_rows, 128), dtype=np.uint32)
    )
    packed = jax.device_put(rng.integers(0, 2**32, (N, 2), dtype=np.uint32))
    qc = jax.device_put(np.ones(N, dtype=np.int32))
    jax.block_until_ready((blocks2, packed, qc))
    measure_rtt(qc)

    # --- stage timings -------------------------------------------------
    @jax.jit
    def hash_only(p):
        limbs = _limbs_from_packed(p[:, 0], p[:, 1], K)
        rows = Q._device_rows(limbs, K, HASHES, BLOOM, rpb, True)
        return rows.sum()

    bench("hash (xxh3 x4 + blocked placement)", hash_only, packed)

    @jax.jit
    def rows_of(p):
        limbs = _limbs_from_packed(p[:, 0], p[:, 1], K)
        return Q._device_rows(limbs, K, HASHES, BLOOM, rpb, True)

    rows = jax.block_until_ready(rows_of(packed))

    @jax.jit
    def gather_only(b2, r):
        g = Q._gather_rows_blocked(b2, r, wpad, rpb)
        return g.astype(jnp.uint32).sum()

    bench("gather blocked (1 block/kmer + lane sel)", gather_only, blocks2, rows)

    @jax.jit
    def gather_and(b2, r):
        andw, present = Q._and_present(b2, r, wpad, rpb)
        return andw.sum() + present.sum()

    bench("gather + AND + present", gather_and, blocks2, rows)

    # raw block take (no lane select): the gather lower bound XLA gives us
    blkidx = jax.block_until_ready(
        jax.jit(lambda r: (r[:, 0] // np.int32(rpb)).astype(jnp.int32))(rows))

    @jax.jit
    def take_blocks(b2, bi):
        return jnp.take(b2, bi, axis=0).sum(dtype=jnp.uint32)

    bench("raw jnp.take [N] full 128-lane blocks", take_blocks, blocks2, blkidx)

    srt = jax.block_until_ready(jax.jit(jnp.sort)(blkidx))
    bench("raw jnp.take, presorted block idx", take_blocks, blocks2, srt)

    # --- full kernels ----------------------------------------------------
    C = COLORS
    chunk = 1 << 20

    def full(stats, hist, oc, of, pk, q):
        return Q.query_accumulate_hash_scan_exact(
            stats, hist, oc, of, blocks2, pk, q,
            wpad=wpad, chunk=chunk, k=K, num_hash=HASHES,
            bloom_size=BLOOM, rpb=rpb, bv=2,
        )

    def mk_state():
        stats = jnp.concatenate([
            jnp.zeros(C, dtype=jnp.int32),
            jnp.full(wpad, -1, dtype=jnp.int32),
            jnp.array([1, 0], dtype=jnp.int32),
        ])
        hist = jnp.zeros((C, Q.FREQ_CAP), dtype=jnp.int32)
        oc = jnp.zeros(1 << 15, dtype=jnp.int32)
        of = jnp.zeros(1 << 15, dtype=jnp.int32)
        return stats, hist, oc, of

    def run_full():
        s = mk_state()
        return full(*s, packed, qc)

    bench("FULL query_accumulate_hash_scan_exact", run_full, reps=3)

    # sort cost reference
    @jax.jit
    def sort4(b, o, q, g):
        return jax.lax.sort((b, o, q, g), num_keys=1)

    offp = jax.device_put(rng.integers(0, 2**32, N, dtype=np.uint32))
    gidx = jax.device_put(np.arange(N, dtype=np.int32))
    bench("lax.sort N keys + 3 payloads", sort4, blkidx, offp, qc, gidx)

    # stream kernel (blocked-v2)
    try:
        from colorid_tpu.ops.stream_query import (
            byte_plane_blocks, stream_accumulate_hash,
        )

        bp = byte_plane_blocks(blocks2)
        np.asarray(bp[:1, :1])  # materialize

        qc16 = jax.device_put(np.ones(N, dtype=np.uint16))

        def run_stream():
            s = mk_state()
            return stream_accumulate_hash(
                *s, blocks2, bp, packed, qc16, jnp.int32(0),
                wpad=wpad, k=K, num_hash=HASHES, bloom_size=BLOOM,
                rpb=rpb, n_colors=C,
            )

        bench("FULL stream_accumulate_hash (sorted)", run_stream, reps=3)
    except Exception as e:
        print(f"stream kernel skipped: {e}")


if __name__ == "__main__":
    main()
