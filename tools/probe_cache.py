"""Instrument the driver-bench warm path step by step (existing jaxcache)."""
import os, sys, time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench_cache/jaxcache")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_explain_cache_misses", True)

t0 = time.time()
def lap(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)

from colorid_tpu.index.bigsi import BigsiIndex
from colorid_tpu.engine import QueryEngine

lap("imports done")
bindex = BigsiIndex.load("/root/repo/.bench_cache/bench50M_blocked.bxi")
lap("blocked index loaded (host)")
bengine = QueryEngine(bindex, chunk=1 << 21)
lap("engine constructed (device_put matrix + byte planes dispatched)")
# force materialization of the device matrix
np.asarray(bengine.blocks2[:1, :1])
np.asarray(bengine._blocks_bp[:1, :1])
lap("matrix + byte planes resident on device")

z = np.load("/root/repo/.bench_cache/query_kmers_v5.npz")
keys, reads_packed = z["keys"], z["reads_packed"]
lap(f"query npz loaded ({reads_packed.shape})")
N_READS, READ_LEN, K = reads_packed.shape[0], 150, 31
lens = np.full(N_READS, READ_LEN, dtype=np.int32)

t1 = time.time()
res, n_u = bengine.search_reads(reads_packed, lens, k=K, L=READ_LEN, filter_t=1)
lap(f"warm search_reads done in {time.time()-t1:.1f}s, n_u={n_u} (expect {keys.shape[0]})")
for i in range(2):
    t1 = time.time()
    res, n_u = bengine.search_reads(reads_packed, lens, k=K, L=READ_LEN, filter_t=1)
    dt = time.time() - t1
    lap(f"trial {i}: {dt:.3f}s -> {keys.shape[0]/dt/1e6:.2f} M kmers/s")
