"""Decompose one bench-primary trial (engine.search_reads) on the real chip.

Uses the cached bench artifacts (.bench_cache) when present, else synthesizes
a smaller batch. Prints each span as it completes (unbuffered).

    python -u tools/profile_r3.py [n_reads_thousands]
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
R = int(float(sys.argv[1]) * 1000) if len(sys.argv) > 1 else 400_000


def span(name, fn, reps=2):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<56} {best*1e3:9.2f} ms", flush=True)
    return best, out


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print(f"device: {jax.devices()[0]}", flush=True)

    from colorid_tpu.engine import QueryEngine
    from colorid_tpu.index.bigsi import BigsiIndex
    from colorid_tpu.ops import extract as E
    from colorid_tpu.pipelines.build import build_index

    cache = os.path.join(ROOT, ".bench_cache")
    npz = os.path.join(cache, "query_kmers_v5.npz")
    rng = np.random.default_rng(0)
    if os.path.exists(npz):
        z = np.load(npz)
        reads_packed = z["reads_packed"][:R]
        keys_n = z["keys"].shape[0]
        print(f"cached reads: {reads_packed.shape}, {keys_n} uniq kmers", flush=True)
    else:
        reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(R, L))
        reads_packed = E.pack_reads(reads)
        print(f"synthetic random reads: {reads_packed.shape}", flush=True)
    lens = np.full(reads_packed.shape[0], L, dtype=np.int32)
    Rr = reads_packed.shape[0]
    NW = L - K + 1
    N = Rr * NW
    print(f"{Rr/1e3:.0f}k reads -> {N/1e6:.1f}M windows", flush=True)

    bxi = os.path.join(cache, "bench50M_blocked.bxi")
    if os.path.exists(bxi):
        index = BigsiIndex.load(bxi)
        print("loaded cached blocked index", flush=True)
    else:
        # small stand-in blocked index (same wpad/rpb class as the bench's)
        refs = {}
        d1 = "/root/reference/test_data/refs"
        for f in sorted(os.listdir(d1)):
            if f.endswith(".fasta"):
                refs[f[:-6]] = [os.path.join(d1, f)]
        t0 = time.time()
        index = build_index(refs, 50_000_000, 4, K, verbose=False, blocked=True)
        print(f"built 4-genome blocked index: {time.time()-t0:.1f}s", flush=True)
    print(
        f"index: C={index.n_colors} W={index.words_per_row} "
        f"bloom={index.bloom_size} blocked={index.blocked}", flush=True,
    )

    engine = QueryEngine(index, chunk=1 << 21)

    # --- H2D ship -----------------------------------------------------------
    t0 = time.perf_counter()
    packed_d = jax.device_put(reads_packed)
    lens_d = jax.device_put(lens)
    jax.block_until_ready(packed_d)
    print(
        f"{'H2D ship reads':<56} {(time.perf_counter()-t0)*1e3:9.2f} ms "
        f"({reads_packed.nbytes/1e6:.0f} MB)", flush=True,
    )

    # --- extract_count -------------------------------------------------------
    fe = lambda: E.extract_count(packed_d, lens_d, k=K, L=L, filter_t=1, d=1)
    t_ex, (pk, qc, n_u) = span("extract_count (unpack+limbs+sort+filter)", fe)
    n = int(n_u)
    print(f"  n_unique = {n}", flush=True)

    # --- full search_reads (the bench trial) ---------------------------------
    fs = lambda: engine.search_reads(packed_d, lens, k=K, L=L, filter_t=1)
    t_sr, (res, _) = span("FULL search_reads (bench trial, incl. H2D)", fs)

    # --- query-only: exact-scan over the device-resident extracted keys ------
    from colorid_tpu.ops.query import query_accumulate_hash_scan_exact, FREQ_CAP

    C = index.n_colors
    stats0 = jnp.concatenate(
        [
            jnp.zeros(C, dtype=jnp.int32),
            jnp.full(engine.wpad, -1, dtype=jnp.int32),
            jnp.array([1, 0], dtype=jnp.int32),
        ]
    )
    hist0 = jnp.zeros((C, FREQ_CAP), dtype=jnp.int32)
    npad = ((n + (1 << 21) - 1) >> 21) << 21
    capO = npad
    pk_f = jnp.zeros((npad, 2), dtype=jnp.uint32).at[:n].set(pk[:n])
    qc_f = jnp.zeros(npad, dtype=jnp.int32).at[:n].set(qc[:n])
    jax.block_until_ready((pk_f, qc_f))

    def fq():
        return query_accumulate_hash_scan_exact(
            jnp.array(stats0), jnp.array(hist0),
            jnp.zeros(capO, dtype=jnp.int32), jnp.zeros(capO, dtype=jnp.int32),
            engine.blocks2, pk_f, qc_f,
            wpad=engine.wpad, chunk=1 << 20, k=K,
            num_hash=index.num_hash, bloom_size=index.bloom_size,
            rpb=engine.rpb, bv=engine.bv or 1,
        )

    t_q, _ = span(f"query kernel only ({n/1e6:.1f}M kmers, blocked bv={engine.bv})", fq)
    print(
        f"rates: extract {N/t_ex/1e6:.1f} M win/s | query {n/t_q/1e6:.1f} "
        f"M kmers/s | e2e {n/t_sr/1e6:.2f} M kmers/s", flush=True,
    )


if __name__ == "__main__":
    main()
