"""Benchmark: queried k-mers/s through the BIGSI search hot loop on one chip.

Mirrors the reference's timed span: `colorid search` wall-time of the
per-k-mer row-fetch/AND/count loop (batch_search_pe.rs:42-93, the span it
prints as "Search: {} sec", which starts with the query k-mer count-map
already resident in host RAM). Two measured paths, best wins:

- PRIMARY A (stream): packed query k-mers resident in HBM (the TPU-native
  analogue of "count-map in RAM"); steady-state over several exact-mode
  sorted-stream dispatches (hash/sort/gather/AND/count,
  ops/stream_query.py) with ONE stacked D2H fetch of all accumulators.
- PRIMARY B (fused reads): strictly MORE work than the reference span —
  2-bit packed reads in HBM, device extracts + counts + filters k-mers and
  queries, all in one dispatch (ops/fused_reads.py).

When both complete, their per-color counts must agree exactly (independent
paths; an in-bench parity check).

Robustness: the axon tunnel to the chip can wedge per-connection (an RPC
that never returns while fresh processes work fine — observed 2026-08-20,
it zeroed the round-3 driver run). Every risky step runs under a stall
alarm; a stall or crash before any measurement re-execs into a fresh
process (new connection) within the total deadline. Completed measurements
persist to a state file so no attempt can lose an earlier number. The JSON
line is printed exactly once, from whichever process finishes.

Setup (deterministic, cached under .bench_cache/):
- index: every reference genome bundled with the repo (21 fastas: 4
  Listeria phages + 17 of the 65-genome panel) at the reference's
  isolate-ID defaults k=31, bloom=50M, hashes=4 (README.md:59,
  main.rs:475-477), blocked-v4 layout.
- query: 400k reads of 150bp sampled from the genomes => ~10M distinct
  filtered k-mers with realistic hit/uniq structure.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We
use an ESTIMATE of 4M queried-k-mers/s for multithreaded Rust (per-k-mer
work: 4 xxh3 hashes + 4 hash-map probes + BitVec AND + bit scan;
~250ns/kmer single-thread, 16 threads) — vs_baseline = value / 4e6.

Prints exactly one JSON line on stdout.
"""

import atexit
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
N_READS = int(os.environ.get("BENCH_N_READS", 400_000))
READ_LEN = 150

# total wall budget, shared across re-exec attempts via BENCH_T0
DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", "480"))
T0 = float(os.environ.get("BENCH_T0") or time.time())
ATTEMPT = int(os.environ.get("BENCH_ATTEMPT", "0"))
# retries are budget-gated (remaining() checks); the count only guards
# against pathological tight loops — a dead-tunnel attempt costs ~95s, so
# a 480s budget can productively use ~5
MAX_ATTEMPTS = 8
STATE_PATH = os.path.join(CACHE, "bench_state.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def remaining() -> float:
    return T0 + DEADLINE_S - time.time()


# ---------------------------------------------------------------------------
# state across re-exec attempts + the print-exactly-once JSON contract

def _load_state() -> dict:
    try:
        with open(STATE_PATH) as f:
            st = json.load(f)
        if st.get("t0") == T0:  # same bench run (not a stale file)
            return st
    except Exception:
        pass
    return {"t0": T0}


STATE = _load_state()


def record(key: str, value: float):
    STATE[key] = max(float(value), float(STATE.get(key) or 0.0))
    try:
        os.makedirs(CACHE, exist_ok=True)
        with open(STATE_PATH + ".tmp", "w") as f:
            json.dump(STATE, f)
        os.replace(STATE_PATH + ".tmp", STATE_PATH)
    except Exception as e:
        log(f"state persist failed ({e}); continuing")


_EMITTED = False


def emit_json():
    """Print the ONE JSON line from the best recorded measurements."""
    global _EMITTED
    if _EMITTED:
        return
    cands = {
        k: STATE.get(k) for k in ("stream", "fused", "classic", "generic")
    }
    best = max((v for v in cands.values() if v), default=0.0)
    if not best:
        return  # nothing measured; caller decides the exit path
    _EMITTED = True
    rec = {
        "metric": "queried_kmers_per_s_1chip",
        "value": round(best),
        "unit": "kmers/s",
        "vs_baseline": round(best / BASELINE_KMERS_PER_S, 3),
    }
    for k, v in cands.items():
        if v:
            rec[f"{k}_kmers_per_s"] = round(v)
    if STATE.get("read_id"):
        rec["read_id_pairs_per_s"] = round(STATE["read_id"])
    if STATE.get("parity"):
        rec["parity"] = STATE["parity"]
    print(json.dumps(rec), flush=True)


def _atexit_backstop():
    # unexpected exit path: still print whatever was measured
    emit_json()


atexit.register(_atexit_backstop)


def reexec(reason: str):
    """Start over in a fresh process (fresh tunnel connection)."""
    if ATTEMPT + 1 >= MAX_ATTEMPTS or remaining() < 120:
        log(f"not re-execing ({reason}): attempt={ATTEMPT}, "
            f"remaining={remaining():.0f}s")
        emit_json()
        if _EMITTED:
            raise SystemExit(0)
        raise SystemExit(f"no measurement completed ({reason})")
    log(f"re-exec in fresh process: {reason} "
        f"(attempt {ATTEMPT + 1}, {remaining():.0f}s left)")
    env = dict(
        os.environ,
        BENCH_T0=repr(T0),
        BENCH_ATTEMPT=str(ATTEMPT + 1),
    )
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, *sys.argv], env)


# ---------------------------------------------------------------------------
# stall alarms
#
# Two layers. SIGALRM gives soft per-step budgets (raises _Deadline so the
# phase can be skipped) — but a Python signal handler only runs when the
# main thread returns to the interpreter, and a wedged tunnel RPC blocks
# inside C forever (observed 2026-08-20: main thread parked in sock recv,
# alarm never delivered). The watchdog THREAD is the hard backstop: it
# re-execs a fresh process (fresh connection) or emits the best recorded
# number and exits, no matter what the main thread is stuck in.

class _Deadline(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Deadline()


_WATCH = {"deadline": None, "name": ""}


def _watchdog_loop():
    while True:
        time.sleep(5)
        now = time.time()
        hard_total = T0 + DEADLINE_S + 30
        d = _WATCH["deadline"]
        if (d and now > d) or now > hard_total:
            why = (
                f"hard stall in [{_WATCH['name']}]" if d and now > d
                else "total deadline exceeded"
            )
            log(f"watchdog: {why}")
            # prefer a fresh process while budget allows: recorded
            # measurements live in the state file, so nothing is lost and
            # the remaining phases get another chance on a new connection
            if ATTEMPT + 1 < MAX_ATTEMPTS and remaining() > 150:
                log(f"watchdog: re-exec (attempt {ATTEMPT + 1})")
                env = dict(
                    os.environ,
                    BENCH_T0=repr(T0),
                    BENCH_ATTEMPT=str(ATTEMPT + 1),
                )
                sys.stderr.flush()
                try:
                    os.execve(sys.executable, [sys.executable, *sys.argv], env)
                except Exception:
                    pass
            if any(STATE.get(k) for k in ("stream", "fused", "classic")):
                emit_json()
                sys.stdout.flush()
                sys.stderr.flush()
                os._exit(0)
            log("watchdog: no measurement and no budget to retry")
            sys.stderr.flush()
            os._exit(1)


def start_watchdog():
    import threading

    t = threading.Thread(target=_watchdog_loop, daemon=True)
    t.start()


class step:
    """Bound a risky step: on soft stall raise _Deadline (handled
    per-phase); the watchdog thread enforces cap + 45s as the hard limit."""

    def __init__(self, name: str, cap: float):
        self.name = name
        self.cap = cap

    def __enter__(self):
        import signal

        budget = max(min(self.cap, remaining() - 10), 1)
        signal.alarm(int(budget))
        self.t0 = time.time()
        _WATCH["name"] = self.name
        _WATCH["deadline"] = self.t0 + budget + 45
        return self

    def __exit__(self, et, ev, tb):
        import signal

        signal.alarm(0)
        _WATCH["deadline"] = None
        if et is None:
            log(f"[{self.name}] {time.time() - self.t0:.1f}s")
        return False


# ---------------------------------------------------------------------------
# fixtures (cached)

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


def build_or_load_index(blocked=True):
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


def make_query_kmers():
    """Deterministic synthetic read set. Returns the filtered query k-mer
    batch (packed + frequencies) AND the raw reads as 2-bit packed words
    (the fused reads path's input, ops/fused_reads.py)."""
    from colorid_tpu import native
    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.ops.extract import pack_reads

    os.makedirs(CACHE, exist_ok=True)
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


# ---------------------------------------------------------------------------
# measured phases

def _trials(name: str, fn, n_trials: int, budget_s: float) -> float:
    best = float("inf")
    deadline = time.time() + budget_s
    for trial in range(n_trials):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        log(f"{name} trial {trial}: {dt:.3f}s")
        best = min(best, dt)
        if time.time() > deadline:
            log(f"{name}: trial budget exhausted")
            break
    return best


def phase_stream(engine, keys, qcounts, packed) -> np.ndarray | None:
    """PRIMARY A: device-resident packed k-mers through the sorted-stream
    dispatch. Returns the per-color counts for the cross-check."""
    import jax

    from colorid_tpu.ops.stream_query import PC

    n = packed.shape[0]
    P = ((n + PC - 1) // PC) * PC
    pk = np.zeros((P, 2), dtype=np.uint32)
    pk[:n] = packed
    qc32 = np.zeros(P, dtype=np.int32)
    qc32[:n] = np.maximum(qcounts, 1)
    with step("stream H2D", 150):
        pk_dev = jax.device_put(pk)
        qc_dev = jax.device_put(qc32)
        np.asarray(pk_dev[:1, :1])  # force the transfer before the span
        np.asarray(qc_dev[:1])
    holder = {}
    # steady-state span: several async dispatches drain through the device
    # queue back-to-back and ONE stacked D2H fetches all their
    # accumulators, amortizing the tunnel round-trip the way a streaming
    # pipeline overlaps fetches with the next batch (the reference's span
    # is likewise a continuous loop over the whole query stream). DISP
    # sweep on-chip with the packed-key sort (2026-08-21): 8/12/16 ->
    # 85.4/86.3/86.0 M; 12 balances the longer steady window against
    # per-trial budget (3 trials x ~1.4s).
    DISP = int(os.environ.get("BENCH_STREAM_DISPATCHES", 12))

    # the host counted the query k-mers, so the batch's max frequency is
    # known for free; below 2^11 it lets the engine drop the sort's
    # frequency payload array (ops/stream_query.QKEY_BITS sort diet)
    max_freq = int(qc32.max())

    def run():
        import jax.numpy as jnp

        outs = [
            engine.search_keys_dev_async(pk_dev, qc_dev, k=K, max_freq=max_freq)
            for _ in range(DISP)
        ]
        big = np.asarray(jnp.stack([o[0] for o in outs]))
        res = None
        for i, o in enumerate(outs):
            res = engine.search_keys_dev_finish(big[i], o[1], o[2], o[3])
            if res is None:
                break
        holder["res"] = res

    with step("stream warm (compile + first run)", 240):
        run()
    if holder["res"] is None:
        # kernel residual/overflow capacity exceeded (pathological probe
        # distribution); deterministic, so skip the phase rather than retry
        log("stream capacity exceeded; skipping PRIMARY A")
        return None
    with step("stream trials", 120):
        best = _trials("stream", run, 3, 90)
    value = DISP * n / best
    log(
        f"stream: {value / 1e6:.2f} M kmers/s "
        f"({DISP} dispatches x {n} k-mers in {best:.3f}s)"
    )
    record("stream", value)
    return holder["res"].counts


def phase_generic(engine, keys, qcounts, packed):
    """Mid-tier fallback when the stream dispatch can't measure: per-k-mer
    shipping through the generic gather path on the SAME engine (no second
    index upload; cheap compile — the round-1/2 primary's machinery)."""
    qc = np.asarray(qcounts, dtype=np.int32)
    stream_state = engine._stream
    engine._stream = False
    try:
        def run():
            return engine.search_keys(None, qcounts=qc, packed_all=packed, k=K)

        with step("generic warm", 240):
            run()
        with step("generic trials", 120):
            best = _trials("generic", run, 3, 90)
    finally:
        engine._stream = stream_state
    value = keys.shape[0] / best
    log(f"generic: {value / 1e6:.2f} M kmers/s")
    record("generic", value)


# Fused-phase read cap: dispatches spanning ~48M k-mer windows (400k
# reads) wedge the current axon tunnel/server (observed 4/4 on
# 2026-08-20; 24M-window dispatches complete in seconds), so the fused
# phase measures a 200k-read prefix by default with its own numerator.
FUSED_READS = int(os.environ.get("BENCH_FUSED_READS", 200_000))


def _prefix_kmers(reads_packed):
    """Host-side independent k-merization of the read subset (NativeCounter
    over the unpacked bases) — the parity reference for the fused phase's
    device counting AND the query batch for the prefix cross-check."""
    from colorid_tpu import native

    R, Lw = reads_packed.shape
    shifts = (2 * (15 - np.arange(16, dtype=np.uint32))).astype(np.uint32)
    codes = (
        (reads_packed[:, :, None] >> shifts) & np.uint32(3)
    ).reshape(R, Lw * 16)[:, :READ_LEN].astype(np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)[codes]
    nc = native.NativeCounter(K)
    if not nc.add_many(np.ascontiguousarray(bases)):
        raise RuntimeError("unexpected fallback unpacking bench reads")
    packed, qcounts = nc.dump_packed(1)
    return packed, qcounts


def phase_fused(engine, keys, reads_packed, stream_P=0) -> np.ndarray | None:
    """PRIMARY B: fused reads path (extraction + counting + query in one
    dispatch) over device-resident 2-bit packed reads. Returns the
    per-color counts when the full read set was used (comparable with the
    stream phase); when a prefix was measured, cross-checks its counts
    against one stream dispatch over the host-counted prefix k-mers
    (padded to the stream phase's P so the compiled kernel is reused)."""
    import jax

    R = min(FUSED_READS, reads_packed.shape[0])
    sub = reads_packed[:R]
    full = R == reads_packed.shape[0]
    if full:
        n_expected, pfx_packed, pfx_qc = keys.shape[0], None, None
    else:
        pfx_packed, pfx_qc = _prefix_kmers(sub)
        n_expected = pfx_packed.shape[0]
    lens = np.full(R, READ_LEN, dtype=np.int32)
    with step("fused H2D", 150):
        reads_dev = jax.device_put(sub)
        lens_dev = jax.device_put(lens)
        np.asarray(reads_dev[:1, :1])
    holder = {}
    # steady-state span like phase_stream: DISPF async fused dispatches
    # drain back-to-back + ONE stacked D2H (each dispatch is its own
    # <=24M-window program — the wedge risk is per-program size, and the
    # stream phase stacks 12 programs without issue)
    DISPF = int(os.environ.get("BENCH_FUSED_DISPATCHES", 4))

    def run_async():
        import jax.numpy as jnp

        outs = [
            engine.search_reads_fused_async(
                reads_dev, lens_dev, k=K, L=READ_LEN, filter_t=1
            )
            for _ in range(DISPF)
        ]
        big = np.asarray(jnp.stack([o[0] for o in outs]))
        out = None
        for i, o in enumerate(outs):
            out = engine.search_reads_fused_finish(big[i], o[1], o[2], o[3])
            if out is None:
                raise RuntimeError("fused capacity exceeded")
        holder["out"] = out

    def run_sync():
        holder["out"] = engine.search_reads(
            reads_dev, lens_dev, k=K, L=READ_LEN, filter_t=1
        )

    try:
        engine.search_reads_fused_async  # probe eligibility cheaply below
        run, disp = run_async, DISPF
    except AttributeError:  # pragma: no cover - forward-compat guard
        run, disp = run_sync, 1

    # cold compile of the fused graph is ~100-150s on this box; the cap
    # must not kill a healthy compile (watchdog adds 45s of hard grace)
    with step("fused warm (compile + first run)", 300):
        try:
            run()
        except ValueError as e:  # async ineligible (layout/envelope)
            log(f"fused async ineligible ({e}); synchronous span")
            run, disp = run_sync, 1
            run()
    res, n_u = holder["out"]
    if n_u != n_expected:  # device counting parity guard
        raise RuntimeError(f"device count mismatch: {n_u} != {n_expected}")
    with step("reads trials", 120):
        best = _trials("reads", run, 3, 90)
    value = disp * n_u / best
    log(f"fused reads ({R} reads, {disp} dispatches): "
        f"{value / 1e6:.2f} M kmers/s")
    record("fused", value)
    if full:
        return holder["out"][0].counts
    # prefix cross-check: the stream path over the independently counted
    # prefix k-mers must produce identical per-color counts (padding to the
    # stream phase's P reuses its compiled kernel when available)
    if engine._stream and stream_P:
        from colorid_tpu.ops.stream_query import PC

        P = max(((n_expected + PC - 1) // PC) * PC, stream_P)
        pk = np.zeros((P, 2), dtype=np.uint32)
        pk[:n_expected] = pfx_packed
        qc32 = np.zeros(P, dtype=np.int32)
        qc32[:n_expected] = np.maximum(pfx_qc, 1)
        with step("fused prefix cross-check", 180):
            chk = engine.search_keys_dev(
                jax.device_put(pk), jax.device_put(qc32), k=K
            )
        if chk is not None:
            if (chk.counts == res.counts).all():
                log("parity check: fused prefix counts match the stream "
                    f"path (total hits {int(chk.counts.sum())})")
            else:
                log("PARITY MISMATCH: fused prefix vs stream counts differ "
                    f"({res.counts.tolist()} vs {chk.counts.tolist()}); "
                    "dropping the fused measurement")
                STATE.pop("fused", None)
                STATE["parity"] = "fused_mismatch"
                record("stream", STATE.get("stream") or 0.0)
    return None


def phase_classic(keys, qcounts, packed) -> None:
    """Reference-placement (classic) layout, measured UNCONDITIONALLY each
    round — the configuration whose TSVs can match the reference binary
    bit-for-bit (xxh3 % bloom_size row placement, simple_bloom.rs:19-26).
    Device-resident packed k-mers, steady-state span like phase_stream:
    DISP async dispatches drain back-to-back + ONE stacked D2H fetch. The
    engine picks its fastest eligible classic path internally."""
    import jax
    import jax.numpy as jnp

    from colorid_tpu.engine import QueryEngine

    index = build_or_load_index(blocked=False)
    with step("classic engine upload", 200):
        engine = QueryEngine(index, chunk=1 << 20)
        np.asarray(engine.blocks2[:1, :1])  # force the 200MB H2D
        if engine._stream_classic:
            np.asarray(engine._blocks_bp[:1, :1])  # byte planes too
    chunk = min(engine.chunk, 1 << 20)
    n = packed.shape[0]
    P = ((n + chunk - 1) // chunk) * chunk  # also a multiple of EPC_CL
    pk = np.zeros((P, 2), dtype=np.uint32)
    pk[:n] = packed
    qc32 = np.zeros(P, dtype=np.int32)
    qc32[:n] = np.maximum(qcounts, 1)
    with step("classic H2D", 150):
        pk_dev = jax.device_put(pk)
        qc_dev = jax.device_put(qc32)
        np.asarray(pk_dev[:1, :1])
        np.asarray(qc_dev[:1])
    DISP = int(os.environ.get("BENCH_STREAM_DISPATCHES", 4))
    holder = {}

    def make_run(dispatch):
        def run():
            outs = [dispatch(pk_dev, qc_dev, k=K) for _ in range(DISP)]
            big = np.asarray(jnp.stack([o[0] for o in outs]))
            for i, o in enumerate(outs):
                holder["res"] = engine.search_keys_dev_finish(
                    big[i], o[1], o[2], o[3]
                )
        return run

    run_g = make_run(engine.search_keys_dev_generic_async)
    with step("classic generic warm (compile + first run)", 300):
        run_g()
    counts_g = holder["res"].counts.copy()
    with step("classic generic trials", 120):
        best = _trials("classic-generic", run_g, 2, 60)
    value = DISP * n / best
    log(f"classic generic: {value / 1e6:.2f} M kmers/s "
        f"({DISP} dispatches x {n} k-mers in {best:.3f}s)")
    record("classic", value)

    # classic sorted-row-stream kernel: must agree with the generic gather
    # bit-for-bit on the same dispatch before its (faster) number counts.
    # A bonus on top of the already-recorded classic number — never let it
    # starve the read_id phase of budget.
    if engine._use_stream_classic(n, K) and remaining() > 180:
        run_s = make_run(engine.search_keys_dev_classic_async)
        with step("classic stream warm (compile + first run)", 300):
            run_s()
        res_s = holder["res"]
        if res_s is None:
            log("classic stream residual capacity tripped; keeping generic")
        elif not (res_s.counts == counts_g).all():
            log("PARITY MISMATCH: classic stream vs generic per-color "
                f"counts ({res_s.counts.tolist()} vs {counts_g.tolist()}); "
                "keeping the generic number")
            STATE["parity"] = (STATE.get("parity") or "") + "+classic"
        else:
            log("parity check: classic stream and generic counts identical")
            with step("classic stream trials", 120):
                best_s = _trials("classic-stream", run_s, 3, 90)
            value_s = DISP * n / best_s
            log(f"classic stream: {value_s / 1e6:.2f} M kmers/s")
            record("classic", value_s)


def phase_read_id(engine):
    """read_id throughput on synthetic paired-end reads (driver-visible
    secondary metric; reference hot path read_id_mt_pe.rs:701-835)."""
    import gzip

    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.pipelines.read_id import read_id

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
    with step("read_id warm", 180):
        read_id([fq1, fq2], engine, prefix=out)  # warm kernels
    with step("read_id timed", 150):
        # tunnel RTT variance dominates the trial spread (0.73-1.0s for the
        # same work); more trials inside the same budget catch a quiet
        # window more reliably
        dt = _trials(
            "read_id", lambda: read_id([fq1, fq2], engine, prefix=out), 10, 60
        )
    log(f"read_id: {RID_READS} PE pairs in {dt:.1f}s -> "
        f"{RID_READS / dt:.0f} pairs/s")
    record("read_id", RID_READS / dt)


# ---------------------------------------------------------------------------

def main():
    import signal

    signal.signal(signal.SIGALRM, _alarm)
    start_watchdog()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from colorid_tpu.engine import QueryEngine

    measured = lambda: any(
        STATE.get(k) for k in ("stream", "fused", "classic")
    )

    # -- setup (host-side, stall-safe) --------------------------------------
    try:
        # 60s cap: a healthy link answers in 0.3-46s (worst observed); a
        # wedged one never answers, and cheap attempts mean more fresh
        # connections per window (the tunnel wedges per-connection)
        with step("device link warm", 60):
            # first H2D+D2H on the axon tunnel is pathological; also proves
            # this process's connection is alive before committing to it
            np.asarray(jax.device_put(np.ones(8, np.int32)))
    except _Deadline:
        reexec("device link stalled")
    except Exception as e:
        log(f"device link failed ({e})")
        reexec("device link failed")

    keys, qcounts, packed, reads_packed = make_query_kmers()
    log(f"query: {keys.shape[0]} filtered k-mers from {N_READS} reads")
    bindex = build_or_load_index(blocked=True)

    bengine = None
    counts_a = counts_b = None
    try:
        with step("engine upload", 200):
            bengine = QueryEngine(bindex, chunk=1 << 21)
            np.asarray(bengine.blocks2[:1, :1])  # force the 200MB H2D
            if bengine._stream:
                np.asarray(bengine._blocks_bp[:1, :1])
    except _Deadline:
        reexec("index upload stalled")
    except Exception as e:
        log(f"engine construction failed ({e})")
        reexec("engine construction failed")

    # -- PRIMARY A: stream (device-resident k-mers) -------------------------
    try:
        if ATTEMPT > 0 and STATE.get("stream"):
            # a previous attempt already banked this number; spend the
            # remaining budget on the phases that stalled
            log(f"stream already measured ({STATE['stream']:.0f}); skipping")
        elif bengine._stream and remaining() > 60:
            counts_a = phase_stream(bengine, keys, qcounts, packed)
        elif not bengine._stream:
            log("stream path ineligible; skipping PRIMARY A")
    except _Deadline:
        if not measured():
            reexec("stream phase stalled")
        log("stream phase stalled; continuing with recorded measurements")
    except Exception as e:
        log(f"stream phase failed ({type(e).__name__}: {e})")
        if not measured() and remaining() > 150:
            reexec("stream phase failed")

    # -- mid-tier fallback: generic gather on the same engine ---------------
    if not measured() and bengine is not None:
        try:
            if remaining() > 90:
                phase_generic(bengine, keys, qcounts, packed)
        except _Deadline:
            reexec("generic phase stalled")
        except Exception as e:
            log(f"generic phase failed ({type(e).__name__}: {e})")

    # -- PRIMARY B: fused reads path ----------------------------------------
    try:
        if remaining() > 90:
            from colorid_tpu.ops.stream_query import PC

            stream_P = (
                ((packed.shape[0] + PC - 1) // PC) * PC
                if STATE.get("stream") else 0
            )
            counts_b = phase_fused(bengine, keys, reads_packed, stream_P)
    except _Deadline:
        if not measured():
            reexec("fused phase stalled")
        log("fused phase stalled; continuing with recorded measurements")
    except Exception as e:
        log(f"fused phase failed ({type(e).__name__}: {e})")
        if not measured() and remaining() > 150:
            reexec("fused phase failed")

    if counts_a is not None and counts_b is not None:
        if not (counts_a == counts_b).all():
            # a real bug, but never zero the bench for it: keep the
            # stream number (it queries the independently-counted k-mer
            # set) and drop the fused one
            log("PARITY MISMATCH: stream and fused per-color counts differ "
                f"({counts_a.tolist()} vs {counts_b.tolist()}); dropping "
                "the fused measurement")
            STATE.pop("fused", None)
            STATE["parity"] = (
                (STATE.get("parity") or "") + "+fused_full"
            ).lstrip("+")
            record("stream", STATE.get("stream") or 0.0)
        else:
            log("parity check: stream and fused per-color counts identical "
                f"(total hits {int(counts_a.sum())})")

    # -- classic (reference-placement) layout: ALWAYS measured --------------
    # The parity-exact configuration must carry an official number every
    # round (it is also the last-resort primary when everything else fails).
    try:
        if ATTEMPT > 0 and STATE.get("classic"):
            log(f"classic already measured ({STATE['classic']:.0f}); "
                "skipping")
        elif remaining() > 100 or not measured():
            phase_classic(keys, qcounts, packed)
    except _Deadline:
        if not measured():
            reexec("classic phase stalled")
        log("classic phase stalled; continuing with recorded measurements")
    except Exception as e:
        log(f"classic phase failed ({type(e).__name__}: {e})")
        if not measured():
            reexec("classic phase failed")

    # -- secondary: read_id --------------------------------------------------
    try:
        if remaining() > 60 and bengine is not None:
            phase_read_id(bengine)
    except _Deadline:
        log("read_id stalled; skipping")
    except Exception as e:
        log(f"read_id failed ({type(e).__name__}: {e})")

    emit_json()
    if not _EMITTED:
        raise SystemExit("no measurement completed before the deadline")


if __name__ == "__main__":
    main()
