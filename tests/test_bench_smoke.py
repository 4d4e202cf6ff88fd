"""Smoke test for the driver bench contract (bench.py).

Runs bench.py as a subprocess with a COLD temporary cache — the exact
scenario that silently broke in round 1 (N-containing genomes crashed the
reads-path synthesis only when the cache was empty). Tiny sizes keep it
CI-fast; both primaries (reads-path + classic fallback machinery) and the
JSON output contract are exercised end to end.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def test_bench_cold_cache_smoke(tmp_path):
    env = dict(os.environ)
    env.update(
        BENCH_CACHE_DIR=str(tmp_path / "cache"),
        JAX_COMPILATION_CACHE_DIR=str(tmp_path / "jaxcache"),
        # density note: PRIMARY A (sorted-stream over device-resident
        # k-mers) needs >= ~16 probes per 128-block tile or its residual
        # capacity trips; the 3 phage genomes only hold ~90k distinct
        # 31-mers, so the bloom shrinks to 3906 blocks (~23 probes/block)
        BENCH_BLOOM="499968",
        BENCH_N_READS="8000",
        BENCH_MAX_GENOMES="3",
        BENCH_RID_READS="200",
        BENCH_DEADLINE_S="400",
        JAX_PLATFORMS="cpu",
    )
    env.pop("XLA_FLAGS", None)  # single CPU device, no forced 8-dev mesh
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, (
        f"bench rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr tail:\n{proc.stderr[-3000:]}"
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "queried_kmers_per_s_1chip"
    assert rec["unit"] == "kmers/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    # both primaries must have measured (stream + fused reads), the
    # in-bench parity check must have passed, and read_id must report
    assert rec.get("stream_kmers_per_s", 0) > 0, proc.stderr[-3000:]
    assert rec.get("fused_kmers_per_s", 0) > 0, proc.stderr[-3000:]
    # the reference-placement (classic) layout must be measured every run
    assert rec.get("classic_kmers_per_s", 0) > 0, proc.stderr[-3000:]
    assert rec.get("read_id_pairs_per_s", 0) > 0, proc.stderr[-3000:]
    assert "reads trial" in proc.stderr, proc.stderr[-3000:]
    assert "per-color counts identical" in proc.stderr, proc.stderr[-3000:]
    assert "PARITY MISMATCH" not in proc.stderr
