"""Decompose read_id throughput: gzip/decode, C++ set building, device
counting, poll/format. Uses bench-style synthetic PE fastqs.

    python -u tools/profile_rid.py [n_pairs_thousands]
"""

import gzip
import os
import pickle
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".bench_cache", "jaxcache")
)
sys.path.insert(0, ROOT)

import numpy as np

N_PAIRS = int(float(sys.argv[1]) * 1000) if len(sys.argv) > 1 else 20_000
CACHE = os.path.join(ROOT, ".bench_cache")


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print(f"device: {jax.devices()[0]}, {N_PAIRS} PE pairs", flush=True)

    from colorid_tpu import native
    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.engine import QueryEngine
    from colorid_tpu.pipelines import read_id as RID

    with open(os.path.join(CACHE, "prof_v3_idx.pkl"), "rb") as f:
        index = pickle.load(f)
    engine = QueryEngine(index, chunk=1 << 21)
    K = index.k_size

    fq1 = os.path.join(CACHE, f"prid_{N_PAIRS}_r1.fq.gz")
    fq2 = os.path.join(CACHE, f"prid_{N_PAIRS}_r2.fq.gz")
    if not os.path.exists(fq1):
        refs = []
        for d in ("/root/reference/test_data/refs", "/root/reference/refs"):
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".fasta"):
                    p = os.path.join(d, f)
                    if os.path.getsize(p) > 1000:
                        refs.append(p)
        rng = np.random.default_rng(7)
        gs = ["".join(read_fasta(p)).upper() for p in refs]
        comp = bytes.maketrans(b"ACGT", b"TGCA")
        with gzip.open(fq1, "wt") as f1, gzip.open(fq2, "wt") as f2:
            for i in range(N_PAIRS):
                g = gs[int(rng.integers(0, len(gs)))]
                s = int(rng.integers(0, len(g) - 500))
                r1 = g[s : s + 150]
                r2 = g[s + 350 : s + 500].encode().translate(comp)[::-1].decode()
                f1.write(f"@r{i}\n{r1}\n+\n{'I' * 150}\n")
                f2.write(f"@r{i}\n{r2}\n+\n{'I' * 150}\n")
        print("fastqs synthesized", flush=True)

    # stage 1: C++ stream alone
    t0 = time.time()
    n = 0
    batches = []
    for ids, seq_buf, seq_offs, nseqs in native.FastqReadStream(
        fq1, fq2, 15, 50000
    ):
        n += len(ids)
        batches.append((ids, seq_buf, seq_offs, nseqs))
    t_stream = time.time() - t0
    print(f"{'C++ fastq stream (decode+mask+batch)':<44} {t_stream:7.2f}s "
          f"({n/t_stream:7.0f} pairs/s)", flush=True)

    # stage 2: python batch assembly (the list-of-views loop)
    t0 = time.time()
    pybatches = []
    for ids, seq_buf, seq_offs, nseqs in batches:
        batch = []
        j = 0
        for i, rid in enumerate(ids):
            m = int(nseqs[i])
            seqs = [
                seq_buf[seq_offs[j + t] : seq_offs[j + t + 1]]
                for t in range(m)
            ]
            j += m
            batch.append((rid, seqs))
        pybatches.append(batch)
    t_asm = time.time() - t0
    print(f"{'python batch assembly':<44} {t_asm:7.2f}s", flush=True)

    # stage 3: C++ per-read set building (packed + fnv ranks)
    t0 = time.time()
    prepared = []
    for batch in pybatches:
        todo = list(range(len(batch)))
        for g0 in range(0, len(todo), 16384):
            group = todo[g0 : g0 + 16384]
            got = RID._prepare_native(batch, group, index, 1, True)
            prepared.append((len(group), got))
    t_sets = time.time() - t0
    nk = sum(p[1][1].shape[0] for p in prepared if p[1] is not None)
    assert all(p[1] is not None and p[1][0] == 'packed' for p in prepared)
    print(f"{'C++ set build (kmerize+dedupe+fnv rank)':<44} {t_sets:7.2f}s "
          f"({nk/1e6:.1f}M kmers, {nk/t_sets/1e6:.1f} M/s)", flush=True)

    # stage 4: device counting (warm first)
    ng0, got0 = prepared[0]
    engine.readid_counts_packed(got0[1], got0[2], got0[3], ng0, 3, K)
    t0 = time.time()
    for ng, got in prepared:
        engine.readid_counts_packed(got[1], got[2], got[3], ng, 3, K)
    t_dev = time.time() - t0
    print(f"{'device readid counts (warm)':<44} {t_dev:7.2f}s", flush=True)

    # stage 5: full classify_batch (warm)
    for batch in pybatches:
        RID.classify_batch(batch, engine, 1, 1e-3, 3)
        break
    t0 = time.time()
    for batch in pybatches:
        RID.classify_batch(batch, engine, 1, 1e-3, 3)
    t_cls = time.time() - t0
    print(f"{'FULL classify_batch (warm)':<44} {t_cls:7.2f}s "
          f"({n/t_cls:7.0f} pairs/s)", flush=True)

    # end-to-end read_id warm
    out = os.path.join(CACHE, "prid_out")
    RID.read_id([fq1, fq2], engine, prefix=out)
    t0 = time.time()
    RID.read_id([fq1, fq2], engine, prefix=out)
    t_e2e = time.time() - t0
    print(f"{'FULL read_id e2e (warm)':<44} {t_e2e:7.2f}s "
          f"({n/t_e2e:7.0f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
