"""Decompose the bench primary (search_reads) on the real chip: H2D ship,
window extraction + sort-unique counting, and the fused query kernel.

    python tools/profile_reads_path.py [n_reads_thousands]
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

K, L = 31, 150
R = int(float(sys.argv[1]) * 1000) if len(sys.argv) > 1 else 400_000

_RTT = [0.0]


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def bench(name, fn, *args, reps=3, inner=4, n=None):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0 - _RTT[0]) / inner)
    rate = (n or R) / best / 1e6
    print(f"{name:<52} {best*1e3:8.2f} ms   {rate:9.2f} M/s")
    return best


def main():
    from colorid_tpu.ops import extract as E

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}, R = {R/1e3:.0f}k reads x {L}bp "
          f"-> {R*(L-K+1)/1e6:.1f}M windows")
    reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(R, L))
    packed_h = E.pack_reads(reads)
    lens = np.full(R, L, dtype=np.int32)

    t0 = time.perf_counter()
    packed = jax.device_put(packed_h)
    lens_d = jax.device_put(lens)
    _sync(packed)
    print(f"H2D ship {packed_h.nbytes/1e6:.0f} MB: "
          f"{time.perf_counter()-t0:.2f} s")
    _sync(lens_d)
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        _sync(lens_d)
        best = min(best, time.perf_counter() - t0)
    _RTT[0] = best
    print(f"tunnel D2H RTT: {best*1e3:.1f} ms (subtracted per rep)")

    NW = L - K + 1
    N = R * NW

    @jax.jit
    def unpack_limbs(p):
        codes = E._unpack_codes(p, L)
        lo, hi = E._window_limbs(codes, K, NW)
        return lo.sum() + hi.sum()

    bench("unpack + window limbs (canonical)", unpack_limbs, packed, n=N)

    @jax.jit
    def limbs_sort(p, ln):
        codes = E._unpack_codes(p, L)
        lo, hi = E._window_limbs(codes, K, NW)
        w_idx = jnp.arange(NW, dtype=jnp.int32)[None, :]
        valid = w_idx + K <= ln[:, None]
        SENT = jnp.uint32(0xFFFFFFFF)
        lo = jnp.where(valid, lo, SENT).reshape(-1)
        hi = jnp.where(valid, hi, SENT).reshape(-1)
        s_hi, s_lo = jax.lax.sort((hi, lo), num_keys=2)
        return s_hi[0] + s_lo[0]

    bench("... + lax.sort of all windows", limbs_sort, packed, lens_d, n=N)

    def full_extract(p, ln):
        return E.extract_count(p, ln, k=K, L=L, filter_t=1)

    bench("FULL extract_count", full_extract, packed, lens_d, n=N)


if __name__ == "__main__":
    main()
