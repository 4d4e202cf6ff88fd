"""Time the fused v3 reads path at bench scale on the real chip.

    python -u tools/profile_r3c.py [n_reads_thousands]
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
import numpy as np

K, L = 31, 150
R = int(float(sys.argv[1]) * 1000) if len(sys.argv) > 1 else 400_000


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print(f"device: {jax.devices()[0]}", flush=True)

    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.engine import QueryEngine
    from colorid_tpu.ops.extract import pack_reads
    from colorid_tpu.pipelines.build import build_index

    refs = {}
    for d in ("/root/reference/test_data/refs", "/root/reference/refs"):
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".fasta"):
                p = os.path.join(d, f)
                if os.path.getsize(p) > 1000:
                    refs[f[:-6]] = [p]
    print(f"{len(refs)} genomes", flush=True)

    import pickle

    ck = os.path.join(ROOT, ".bench_cache", "prof_v3_idx.pkl")
    t0 = time.time()
    if os.path.exists(ck):
        with open(ck, "rb") as f:
            index = pickle.load(f)
        print(f"index loaded: {time.time()-t0:.1f}s", flush=True)
    else:
        index = build_index(refs, 50_000_000, 4, K, verbose=False,
                            blocked=True, threads=4)
        with open(ck, "wb") as f:
            pickle.dump(index, f)
        print(f"index built: {time.time()-t0:.1f}s", flush=True)
    print(f"blocked v{index.blocked}, C={index.n_colors}", flush=True)

    # genome-sampled reads (bench-like coverage)
    rng = np.random.default_rng(42)
    genomes = []
    acgt = np.zeros(256, dtype=bool)
    acgt[[65, 67, 71, 84]] = True
    for p in refs.values():
        gb = np.frombuffer("".join(read_fasta(p[0])).upper().encode(),
                           dtype=np.uint8)
        genomes.append(gb)
    gids = rng.integers(0, len(genomes), R)
    all_reads = np.empty((R, L), dtype=np.uint8)
    for gi, gb in enumerate(genomes):
        sel = np.nonzero(gids == gi)[0]
        csum = np.concatenate([[0], np.cumsum(acgt[gb])])
        cand = np.arange(len(gb) - L, dtype=np.int64)
        clean = (csum[cand + L] - csum[cand]) == L
        starts = rng.choice(cand[clean], size=sel.size)
        all_reads[sel] = gb[starts[:, None] + np.arange(L)]
    packed = pack_reads(all_reads)
    lens = np.full(R, L, dtype=np.int32)
    print(f"{R/1e3:.0f}k reads packed ({packed.nbytes/1e6:.0f} MB)", flush=True)

    engine = QueryEngine(index, chunk=1 << 21)
    print(f"stream eligible: {engine._stream}", flush=True)

    t0 = time.time()
    res, n_u = engine.search_reads(packed, lens, k=K, L=L, filter_t=1)
    print(f"warm (compile + run): {time.time()-t0:.1f}s, n_u={n_u}", flush=True)
    for trial in range(4):
        t0 = time.time()
        res, n_u = engine.search_reads(packed, lens, k=K, L=L, filter_t=1)
        dt = time.time() - t0
        print(
            f"trial {trial}: {dt:.3f}s -> {n_u/dt/1e6:.2f} M kmers/s "
            f"({R*(L-K+1)/dt/1e6:.0f} M windows/s)", flush=True,
        )
    print(f"hits: {res.counts.sum()}", flush=True)


if __name__ == "__main__":
    main()
