"""serve /classify throughput on the real chip: concurrent 25-read POSTs
against the bench v3 index (micro-batcher coalescing under load).

    python -u tools/profile_serve.py
"""

import json
import os
import pickle
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".bench_cache", "jaxcache")
)
sys.path.insert(0, ROOT)

import numpy as np


def _post(base, payload):
    req = urllib.request.Request(
        base + "/classify",
        json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print(f"device: {jax.devices()[0]}", flush=True)

    from colorid_tpu.core.fastx import read_fasta
    from colorid_tpu.engine import QueryEngine
    from colorid_tpu.serve import make_server

    with open(os.path.join(ROOT, ".bench_cache", "prof_v3_idx.pkl"), "rb") as f:
        index = pickle.load(f)
    engine = QueryEngine(index, chunk=1 << 21)
    srv = make_server(engine, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    g = "".join(
        read_fasta("/root/reference/test_data/refs/Listeria_phage_B056.fasta")
    ).upper()
    rng = np.random.default_rng(0)
    n_req, reads_per_req = 64, 25
    payloads = []
    for q in range(n_req):
        reads = []
        for i in range(reads_per_req):
            s = int(rng.integers(0, len(g) - 150))
            reads.append({"id": f"q{q}_{i}", "seqs": [g[s : s + 150]]})
        payloads.append({"reads": reads})

    _post(base, payloads[0])  # warm
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=16) as ex:
        outs = list(ex.map(lambda p: _post(base, p), payloads))
    dt = time.time() - t0
    n_reads = sum(len(o["rows"]) for o in outs)
    print(
        f"serve /classify: {n_req} concurrent requests x {reads_per_req} "
        f"reads in {dt:.2f}s -> {n_req/dt:.1f} req/s, {n_reads/dt:.0f} "
        f"reads/s", flush=True,
    )
    srv.shutdown()


if __name__ == "__main__":
    main()
