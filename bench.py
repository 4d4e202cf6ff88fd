"""Benchmark: queried k-mers/s through the BIGSI search hot loop on one chip.

Mirrors the reference's timed span: `colorid search` wall-time of the
per-k-mer row-fetch/AND/count loop (batch_search_pe.rs:42-93, the span it
prints as "Search: {} sec"), excluding input k-mer counting.

Setup (deterministic, cached under .bench_cache/):
- index: every reference genome bundled with the repo (21 fastas: 4 Listeria
  phages + 17 of the 65-genome panel) at the reference's isolate-ID defaults
  k=31, bloom=50M, hashes=4 (README.md:59, main.rs:475-477).
- query: 400k reads of 150bp sampled from the genomes => ~9M distinct
  filtered k-mers with realistic hit/uniq structure.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We
use an estimate of 4M queried-k-mers/s for multithreaded Rust (per-k-mer
work: 4 xxh3 hashes + 4 hash-map probes + BitVec AND + bit scan; ~250ns/kmer
single-thread, 16 threads) — vs_baseline = value / 4e6.

Prints exactly one JSON line on stdout.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache", "jaxcache"),
)

if os.environ.get("JAX_PLATFORMS"):
    # The axon sitecustomize re-registers the remote-TPU backend in every
    # interpreter, so the env var alone cannot switch platforms; honor an
    # explicit request (the CI smoke test runs the whole bench on cpu)
    # through jax.config before any backend initialization.
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

CACHE = os.environ.get(
    "BENCH_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache"),
)
REFS1 = "/root/reference/test_data/refs"
REFS2 = "/root/reference/refs"
K, HASHES = 31, 4
BLOOM = int(os.environ.get("BENCH_BLOOM", 50_000_000))
# smoke-test knobs: cap the genome panel / read_id read count so the whole
# bench (cold cache, both primaries) runs in CI time on the CPU backend
MAX_GENOMES = int(os.environ.get("BENCH_MAX_GENOMES", 0))
RID_READS = int(os.environ.get("BENCH_RID_READS", 20_000))
BASELINE_KMERS_PER_S = 4e6


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _genome_paths():
    paths = []
    for d in (REFS1, REFS2):
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".fasta"):
                p = os.path.join(d, f)
                if os.path.getsize(p) > 1000:  # skip missing-blob stubs
                    paths.append(p)
    if MAX_GENOMES > 0:
        paths = paths[:MAX_GENOMES]
    return paths


def _ref_map():
    return {os.path.basename(p)[:-6]: [p] for p in _genome_paths()}


def build_or_load_index(blocked=False):
    from colorid_tpu.index.bigsi import BigsiIndex
    from colorid_tpu.pipelines.build import build_index

    os.makedirs(CACHE, exist_ok=True)
    name = "bench50M_blocked.bxi" if blocked else "bench50M.bxi"
    path = os.path.join(CACHE, name)
    if os.path.exists(path):
        log(f"loading cached bench index {name}")
        return BigsiIndex.load(path)
    ref_map = _ref_map()
    log(
        f"building {'blocked ' if blocked else ''}index over "
        f"{len(ref_map)} genomes (k={K}, s={BLOOM}, n={HASHES})"
    )
    t0 = time.time()
    index = build_index(
        ref_map, BLOOM, HASHES, K, verbose=False, blocked=blocked,
        threads=2 if blocked else 1,
    )
    log(f"build: {time.time() - t0:.1f}s")
    index.save(path)
    return index


N_READS = int(os.environ.get("BENCH_N_READS", 400_000))
READ_LEN = 150


def make_query_kmers(index):
    """Deterministic synthetic read set. Returns the filtered query k-mer
    batch (classic per-k-mer shipping) AND the raw reads as 2-bit packed
    words (the device-extraction path's input, ops/extract.py)."""
    from colorid_tpu import native
    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.ops.extract import pack_reads

    cache = os.path.join(CACHE, "query_kmers_v5.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["keys"], z["qcounts"], z["packed"], z["reads_packed"]
    rng = np.random.default_rng(42)
    genomes = ["".join(read_fasta(p)) for p in _genome_paths()]
    log(f"synthesizing reads from {len(genomes)} genomes")
    from colorid_tpu.core.dna import COMP, UPPER

    acgt = np.zeros(256, dtype=bool)
    acgt[[ord(c) for c in "ACGT"]] = True

    nc = native.NativeCounter(K)
    gids = rng.integers(0, len(genomes), N_READS)
    flips = rng.random(N_READS) < 0.5
    all_reads = np.empty((N_READS, READ_LEN), dtype=np.uint8)
    for gi, g in enumerate(genomes):
        gb = UPPER[np.frombuffer(g.encode(), dtype=np.uint8)]
        sel = np.nonzero(gids == gi)[0]
        # Only sample windows that are entirely ACGT: some bundled genomes
        # contain N runs, and one non-ACGT byte anywhere would push the whole
        # device batch off the fast path (and trip pack_reads). The clean
        # windows keep the two paths' k-mer sets identical (the n_u guard).
        csum = np.concatenate([[0], np.cumsum(acgt[gb])])
        cand = np.arange(len(gb) - READ_LEN, dtype=np.int64)
        clean = (csum[cand + READ_LEN] - csum[cand]) == READ_LEN
        starts = rng.choice(cand[clean], size=sel.size)
        reads = gb[starts[:, None] + np.arange(READ_LEN)]  # [n_i, 150]
        fl = flips[sel]
        reads[fl] = COMP[reads[fl][:, ::-1]]  # reverse-complement half
        all_reads[sel] = reads
        if not nc.add_many(reads):
            raise RuntimeError("unexpected fallback in bench read synthesis")
    keys, qcounts = nc.dump(1)  # -f 1 style frequency filter
    packed, _ = nc.dump_packed(1)
    reads_packed = pack_reads(all_reads)
    if reads_packed is None:
        raise RuntimeError("bench reads unexpectedly dirty")
    np.savez(
        cache, keys=keys, qcounts=qcounts, packed=packed,
        reads_packed=reads_packed,
    )
    return keys, qcounts, packed, reads_packed


def _classic_stat(index, keys, qcounts, packed):
    """Secondary metric (stderr only): the classic layout + per-k-mer
    shipping path (10B/k-mer host traffic), the round-1 primary — kept for
    continuity across rounds."""
    import time as _t

    from colorid_tpu.engine import QueryEngine

    try:
        engine = QueryEngine(index, chunk=1 << 21)
        qc = qcounts.astype(np.int32)
        run = lambda: engine.search_keys(None, qcounts=qc, packed_all=packed, k=K)
        run()
        best = float("inf")
        for _ in range(2):
            t0 = _t.time()
            run()
            best = min(best, _t.time() - t0)
        log(
            f"classic per-kmer secondary: {packed.shape[0] / best / 1e6:.2f} M kmers/s"
        )
    except Exception as e:
        log(f"classic secondary skipped: {e}")


def _read_id_stat(engine):
    """Secondary metric (stderr only): warm read_id throughput on 20k
    synthetic paired-end reads."""
    import gzip
    import time as _t

    from colorid_tpu.core.dna import COMP, UPPER
    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.pipelines.read_id import read_id

    try:
        fq1 = os.path.join(CACHE, "rid_r1.fq.gz")
        fq2 = os.path.join(CACHE, "rid_r2.fq.gz")
        if not os.path.exists(fq1):
            rng = np.random.default_rng(7)
            gs = ["".join(read_fasta(p)).upper() for p in _genome_paths()]
            comp = bytes.maketrans(b"ACGT", b"TGCA")
            with gzip.open(fq1, "wt") as f1, gzip.open(fq2, "wt") as f2:
                for i in range(RID_READS):
                    g = gs[int(rng.integers(0, len(gs)))]
                    s = int(rng.integers(0, len(g) - 500))
                    r1 = g[s : s + 150]
                    r2 = g[s + 350 : s + 500].encode().translate(comp)[::-1].decode()
                    f1.write(f"@r{i}\n{r1}\n+\n{'I' * 150}\n")
                    f2.write(f"@r{i}\n{r2}\n+\n{'I' * 150}\n")
        out = os.path.join(CACHE, "rid_out")
        read_id([fq1, fq2], engine, prefix=out)  # warm kernels
        t0 = _t.time()
        read_id([fq1, fq2], engine, prefix=out)
        dt = _t.time() - t0
        log(
            f"read_id secondary: {RID_READS} PE reads in {dt:.1f}s -> "
            f"{RID_READS / dt:.0f} read pairs/s"
        )
    except Exception as e:
        log(f"read_id secondary skipped: {e}")


class _Deadline(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Deadline()


def main():
    import signal

    # The tunnel to the chip occasionally stalls for minutes; bound the whole
    # bench so a partial measurement still emits its JSON line.
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("BENCH_DEADLINE_S", "480")))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from colorid_tpu.engine import QueryEngine

    t0 = time.time()
    index = build_or_load_index()
    keys, qcounts, packed, reads_packed = make_query_kmers(index)
    qcounts = qcounts.astype(np.int32)
    log(f"query: {keys.shape[0]} filtered k-mers from {N_READS} reads")

    best = float("inf")
    hits = 0
    engine = None
    lens = np.full(N_READS, READ_LEN, dtype=np.int32)
    try:
        # warm the device link (first D2H on the axon tunnel is pathological)
        np.asarray(jax.device_put(np.ones(8, np.int32)))

        # PRIMARY timed span: the full query arrival — ship 2-bit packed
        # reads (~0.27B/base), extract+count canonical k-mers on device
        # (ops/extract.py), then the fused hash/gather/AND/count hot loop on
        # the blocked (turbo) index layout. Strictly MORE work than the
        # reference's "Search: {} sec" span (which excludes k-mer counting),
        # on ~6x less host-link traffic than per-k-mer shipping.
        try:
            bindex = build_or_load_index(blocked=True)
            bengine = QueryEngine(bindex, chunk=1 << 21)

            def run_reads():
                return bengine.search_reads(
                    reads_packed, lens, k=K, L=READ_LEN, filter_t=1
                )

            t0 = time.time()
            res, n_u = run_reads()  # warm/compile
            warm_dt = time.time() - t0
            log(f"warm reads-path (compile + first run): {warm_dt:.1f}s")
            if n_u != keys.shape[0]:  # device counting parity guard
                raise RuntimeError(
                    f"device count mismatch: {n_u} != {keys.shape[0]}"
                )
            best = warm_dt
            deadline = time.time() + 150
            for trial in range(3):
                t0 = time.time()
                res, n_u = run_reads()
                dt = time.time() - t0
                log(
                    f"reads trial {trial}: {dt:.3f}s -> "
                    f"{keys.shape[0] / dt / 1e6:.2f} M kmers/s"
                )
                best = min(best, dt)
                if time.time() > deadline:
                    log("trial budget exhausted")
                    break
            hits = int(res.counts.sum())
            engine = bengine
        except _Deadline:
            raise
        except Exception as e:
            log(f"reads-path primary failed ({e}); falling back to classic")

        if engine is None:
            # FALLBACK: classic per-k-mer shipping on the classic layout
            # (10B/k-mer host traffic), the round-1 primary. Timings must
            # come solely from this path — discard any partial reads-path
            # timing so the reported number matches the path that produced
            # `hits`.
            best = float("inf")
            engine = QueryEngine(index, chunk=1 << 21)

            def run():
                return engine.search_keys(
                    None, qcounts=qcounts, packed_all=packed, k=K
                )

            t0 = time.time()
            res = run()  # warm/compile
            warm_dt = time.time() - t0
            log(f"warm (compile + first run): {warm_dt:.1f}s")
            best = min(best, warm_dt)
            deadline = time.time() + 150
            for trial in range(3):
                t0 = time.time()
                res = run()
                dt = time.time() - t0
                log(f"trial {trial}: {dt:.3f}s -> {keys.shape[0] / dt / 1e6:.2f} M kmers/s")
                best = min(best, dt)
                if time.time() > deadline:
                    log("trial budget exhausted")
                    break
            hits = int(res.counts.sum())
    except _Deadline:
        log("bench deadline hit; reporting best completed measurement")
        if best == float("inf"):
            raise SystemExit("no measurement completed before the deadline")
    log(f"total per-color hits {hits}")
    value = keys.shape[0] / best
    # the JSON line goes out before optional extras so nothing can starve it
    print(
        json.dumps(
            {
                "metric": "queried_kmers_per_s_1chip",
                "value": round(value),
                "unit": "kmers/s",
                "vs_baseline": round(value / BASELINE_KMERS_PER_S, 3),
            }
        ),
        flush=True,
    )
    signal.alarm(200)  # secondaries are best-effort
    try:
        _read_id_stat(engine)
        _classic_stat(index, keys, qcounts, packed)
    except _Deadline:
        log("secondary metrics skipped (deadline)")
    signal.alarm(0)


def _main_with_retry():
    """The axon tunnel occasionally drops mid-run (FAILED_PRECONDITION on
    any subsequent device op, unrecoverable within the process). Re-exec
    once in a fresh process so one flake can't zero out a bench run."""
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:
        if os.environ.get("COLORID_BENCH_RETRIED") == "1":
            raise
        log(f"bench attempt failed ({type(e).__name__}: {e}); retrying in a "
            "fresh process after 30s")
        time.sleep(30)
        env = dict(os.environ, COLORID_BENCH_RETRIED="1")
        os.execve(sys.executable, [sys.executable, *sys.argv], env)


if __name__ == "__main__":
    _main_with_retry()
