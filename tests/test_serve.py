"""The HTTP serving layer over a small phage index."""

import json
import threading
import urllib.request

import pytest

from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.pipelines.build import build_index, tab_to_map
from colorid_tpu import serve
from tests.test_cli_e2e import _ref_manifest

REFS = "/root/reference/test_data/refs"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    man = _ref_manifest(tmp)
    index = build_index(tab_to_map(man), 400_000, 4, 27, verbose=False)
    path = str(tmp / "panel.bxi")
    index.save(path)
    srv = serve.make_server(path, 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_healthz_info(server):
    h = _get(server + "/healthz")
    assert h["ok"] and h["bloom_size"] == 400_000 and h["n_colors"] == 4
    info = _get(server + "/info")
    names = [a["accession"] for a in info["accessions"]]
    assert "Listeria_phage_B056" in names


def test_search(server):
    seqs = read_fasta(f"{REFS}/Listeria_phage_B056.fasta")[:10]
    out = _post(server + "/search", {"sequences": seqs, "filter": 0, "p_shared": 0.01})
    hits = {r[2] for r in out["rows"]}
    assert "Listeria_phage_B056" in hits
    assert out["num_kmers"] > 1000


def test_classify(server):
    g = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta"))
    reads = [
        {"id": f"r{i}", "seqs": [g[i * 500 : i * 500 + 150]]} for i in range(20)
    ]
    out = _post(server + "/classify", {"reads": reads})
    rows = out["rows"]
    assert len(rows) == 20
    ok = [r for r in rows if r["classification"] == "Listeria_phage_B056"]
    assert len(ok) >= 15


def test_classify_concurrent_microbatch(server):
    """Concurrent small /classify requests coalesce in the micro-batcher and
    return per-request results identical to a sequential run."""
    from concurrent.futures import ThreadPoolExecutor

    g = "".join(read_fasta(f"{REFS}/Listeria_phage_B051.fasta"))
    payloads = [
        {"reads": [{"id": f"c{j}_{i}", "seqs": [g[(7 * j + i) * 300 : (7 * j + i) * 300 + 150]]} for i in range(3)]}
        for j in range(12)
    ]
    sequential = [_post(server + "/classify", p)["rows"] for p in payloads]
    with ThreadPoolExecutor(max_workers=12) as ex:
        concurrent = list(
            ex.map(lambda p: _post(server + "/classify", p)["rows"], payloads)
        )
    assert concurrent == sequential
    for rows, p in zip(concurrent, payloads):
        assert [r["id"] for r in rows] == [r["id"] for r in p["reads"]]


def test_classify_load_coalesces_launches(tmp_path_factory, monkeypatch):
    """Load test: 32 concurrent 1-read /classify requests must coalesce into
    far fewer device launches than requests (the batcher's whole point), all
    succeed, and report a QPS figure (stderr; chip numbers live in PERF.md)."""
    import sys
    import time
    from concurrent.futures import ThreadPoolExecutor

    from colorid_tpu.pipelines import read_id as rid_mod

    launches = []
    real = rid_mod.classify_batch

    def counting(batch, *a, **kw):
        launches.append(len(batch))
        return real(batch, *a, **kw)

    # the batcher worker binds classify_batch at thread start; patch first
    monkeypatch.setattr(rid_mod, "classify_batch", counting)
    tmp = tmp_path_factory.mktemp("serve_load")
    man = _ref_manifest(tmp)
    index = build_index(tab_to_map(man), 400_000, 4, 27, verbose=False)
    path = str(tmp / "panel.bxi")
    index.save(path)
    srv = serve.make_server(path, 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        g = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta"))
        n_req = 32
        payloads = [
            {"reads": [{"id": f"q{i}", "seqs": [g[i * 400 : i * 400 + 150]]}]}
            for i in range(n_req)
        ]
        # warm the kernels so the timed window measures steady state
        _post(base + "/classify", payloads[0])
        launches.clear()
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=n_req) as ex:
            outs = list(
                ex.map(lambda p: _post(base + "/classify", p)["rows"], payloads)
            )
        dt = time.time() - t0
        assert all(len(o) == 1 for o in outs)
        ids = {o[0]["id"] for o in outs}
        assert ids == {f"q{i}" for i in range(n_req)}
        # coalescing: every read launched exactly once, strictly fewer
        # launches than requests. The tight bound (<= n_req // 2) only holds
        # when requests actually overlap; on a loaded CI machine they can
        # serialize, so gate it on observed concurrency (some launch must
        # have carried > 1 request's reads for the tight bound to be fair).
        assert sum(launches) == n_req
        if max(launches) > 1:
            assert len(launches) <= n_req // 2, launches
        print(
            f"\nserve /classify load: {n_req} concurrent 1-read requests in "
            f"{dt:.2f}s -> {n_req / dt:.0f} QPS across {len(launches)} "
            f"launches", file=sys.stderr,
        )
    finally:
        srv.shutdown()


def test_bad_json(server):
    req = urllib.request.Request(
        server + "/search", b"{not json", headers={"Content-Type": "application/json"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_search_device_vs_host_parity(server, monkeypatch):
    """/search must return identical rows whether the body goes through the
    device-resident reads pipeline (default) or the host k-mer counting
    fallback (COLORID_SEARCH_READS=0), including N-containing and short
    sequences and the auto-cutoff (filter=-1) path."""
    import numpy as np

    from colorid_tpu.core.fastx import read_fasta as _rf

    g = "".join(
        _rf(f"{REFS}/Listeria_phage_B056.fasta")
    ).upper()
    rng = np.random.default_rng(8)
    seqs = []
    for i in range(120):
        s = int(rng.integers(0, len(g) - 150))
        r = list(g[s : s + 150])
        if i % 9 == 0:
            for p in rng.integers(0, 150, 4):
                r[int(p)] = "N"
        if i % 17 == 0:
            r = r[:20]  # shorter than k: contributes nothing
        seqs.append("".join(r))
    from colorid_tpu.pipelines import search as S

    calls = {"dev": 0}
    orig = S.device_count_search_seqs

    def spy(*a, **kw):
        r = orig(*a, **kw)
        if r is not None:
            calls["dev"] += 1
        return r

    monkeypatch.setattr(S, "device_count_search_seqs", spy)
    for payload in (
        {"sequences": seqs, "filter": 1},
        {"sequences": seqs, "filter": -1},
        {"sequences": seqs, "gene": True},
    ):
        before = calls["dev"]
        dev = _post(server + "/search", payload)
        assert calls["dev"] == before + 1, "device path did not run"
        monkeypatch.setenv("COLORID_SEARCH_READS", "0")
        try:
            host = _post(server + "/search", payload)
        finally:
            monkeypatch.delenv("COLORID_SEARCH_READS")
        assert calls["dev"] == before + 1, "host fallback did not engage"
        assert dev == host, payload
