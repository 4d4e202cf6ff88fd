"""Fine-grained decomposition of extract_count on the real chip, with real
D2H syncs (block_until_ready is a no-op on the axon tunnel backend).

    python -u tools/profile_r3b.py
"""

import os
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

_RTT = [0.0]


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def span(name, fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0 - _RTT[0])
    print(f"{name:<56} {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print(f"device: {jax.devices()[0]}", flush=True)

    from colorid_tpu.ops import extract as E

    rng = np.random.default_rng(0)
    reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(R, L))
    packed = jax.device_put(E.pack_reads(reads))
    lens = jax.device_put(np.full(R, L, dtype=np.int32))
    _sync(packed)

    small = jax.device_put(np.ones(8, np.int32))
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        _sync(small)
        best = min(best, time.perf_counter() - t0)
    _RTT[0] = best
    print(f"tunnel D2H RTT: {best*1e3:.1f} ms (subtracted)", flush=True)

    @jax.jit
    def unpack_only(p):
        return E._unpack_codes(p, L).sum()

    span("unpack codes", unpack_only, packed)

    @jax.jit
    def limbs_only(p):
        codes = E._unpack_codes(p, L)
        lo, hi = E._window_limbs(codes, K, NW)
        return lo.sum() + hi.sum()

    span("unpack + window limbs", limbs_only, packed)

    # plain 1-key sorts at two sizes for scaling reference
    r4 = jax.device_put(rng.integers(0, 2**32, 4_000_000, dtype=np.uint32))
    r48 = jax.device_put(rng.integers(0, 2**32, N, dtype=np.uint32))
    span("lax.sort 4M u32 (1 key)", jax.jit(lambda x: jax.lax.sort(x)[:1]), r4)
    span("lax.sort 48M u32 (1 key)", jax.jit(lambda x: jax.lax.sort(x)[:1]), r48)

    p48 = jax.device_put(rng.integers(0, 2**32, (2, N), dtype=np.uint32))

    @jax.jit
    def sort2(x):
        a, b = jax.lax.sort((x[0], x[1]), num_keys=2)
        return a[:1] + b[:1]

    span("lax.sort 48M u32 x2 (2 keys)", sort2, p48)

    @jax.jit
    def sort2pay(x):
        a, b, c = jax.lax.sort(
            (x[0], x[1], jnp.arange(N, dtype=jnp.int32)), num_keys=2
        )
        return a[:1] + b[:1] + c[:1]

    span("lax.sort 48M 2 keys + 1 payload", sort2pay, p48)

    @jax.jit
    def cummin48(x):
        s = jax.lax.cummin(x[0].astype(jnp.int32), axis=0, reverse=True)
        return s[:1]

    span("cummin 48M (reverse)", cummin48, p48)

    @jax.jit
    def cumsum48(x):
        return jnp.cumsum(x[0].astype(jnp.int32))[:1]

    span("cumsum 48M", cumsum48, p48)

    @jax.jit
    def scat48(x):
        to = x[0].astype(jnp.int32) & np.int32(2**26 - 1)
        out = jnp.zeros(2**26, dtype=jnp.uint32).at[to].set(
            x[1], mode="drop"
        )
        return out[:1]

    span("scatter-set 48M -> 64M table", scat48, p48)

    fe = jax.jit(
        lambda p, ln: E.extract_count(p, ln, k=K, L=L, filter_t=1, d=1)[2]
    )
    span("FULL extract_count", fe, packed, lens)


if __name__ == "__main__":
    main()
