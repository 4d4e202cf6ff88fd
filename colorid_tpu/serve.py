"""Persistent query server: load the index into device HBM once, answer
search/classify requests over HTTP.

The reference is a batch CLI; for production serving the expensive state
(bit-slice matrix in HBM, jitted kernels) must outlive a single query.

    python -m colorid_tpu.serve -b panel.bxi --port 8750

Endpoints (JSON):
  GET  /healthz            {"ok": true, ...index params}
  GET  /info               info-subcommand content, structured
  POST /search             {"sequences": [...], "filter": -1, "gene": false,
                            "p_shared": 0.35}
                           -> rows of the search TSV, structured
  POST /classify           {"reads": [{"id": ..., "seqs": [...]}, ...],
                            "down_sample": 1, "fp_correct": 3.0,
                            "bitvector_sample": 3}
                           -> read_id rows, structured
"""

from __future__ import annotations

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _State:
    engine = None
    lock = None


def _search_payload(payload: dict) -> dict:
    import numpy as np

    from .core.cutoff import auto_cutoff, clean_counts
    from .core.dna import to_bytes
    from .core.kmers import count_kmers
    from .pipelines.reports import generate_report, generate_report_gene

    engine = _State.engine
    index = engine.index
    seqs = [to_bytes(s) for s in payload["sequences"]]
    keys, counts = count_kmers(
        iter(seqs), index.k_size, skip_n=True, uppercase=True
    )
    filter_t = int(payload.get("filter", -1))
    gene = bool(payload.get("gene", False))
    cov = float(payload.get("p_shared", 0.35))
    if gene:
        keys, counts = clean_counts(keys, counts, 0)
    elif filter_t < 0:
        keys, counts = clean_counts(keys, counts, auto_cutoff(counts))
    else:
        keys, counts = clean_counts(keys, counts, filter_t)
    res = engine.search_keys(keys, qcounts=counts.astype(np.int32))
    report = {
        index.colors[c]: int(res.counts[c])
        for c in range(index.n_colors)
        if res.counts[c] > 0
    }
    if gene:
        lines = generate_report_gene("query", report, keys.shape[0], cov)
    else:
        uniq_stats = {index.colors[c]: s for c, s in res.freq_stats().items()}
        lines = generate_report(
            "query", report, uniq_stats, index.n_ref_kmers, keys.shape[0], cov
        )
    return {
        "num_kmers": int(keys.shape[0]),
        "rows": [l.split("\t") for l in lines],
    }


def _classify_payload(payload: dict) -> dict:
    from .core.dna import to_bytes
    from .pipelines.read_id import classify_batch

    engine = _State.engine
    batch = [
        (r.get("id", f"read{i}"), [to_bytes(s) for s in r["seqs"]])
        for i, r in enumerate(payload["reads"])
    ]
    fp_correct = 10.0 ** (-float(payload.get("fp_correct", 3.0)))
    rows = classify_batch(
        batch,
        engine,
        d=int(payload.get("down_sample", 1)),
        fp_correct=fp_correct,
        start_sample=int(payload.get("bitvector_sample", 3)),
    )
    return {
        "rows": [
            {
                "id": r[0],
                "classification": r[1],
                "support": r[2],
                "total": r[3],
                "status": r[4],
                "n_top": r[5],
            }
            for r in rows
        ]
    }


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # quiet
        pass

    def _send(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        index = _State.engine.index
        if self.path == "/healthz":
            self._send(
                200,
                {
                    "ok": True,
                    "bloom_size": index.bloom_size,
                    "num_hash": index.num_hash,
                    "k_size": index.k_size,
                    "m_size": index.m_size,
                    "n_colors": index.n_colors,
                },
            )
        elif self.path == "/info":
            from .core.stats import false_prob

            accs = [
                {
                    "accession": a,
                    "n_kmers": index.n_ref_kmers.get(a, 0),
                    "false_prob": false_prob(
                        float(index.bloom_size),
                        float(index.num_hash),
                        float(index.n_ref_kmers.get(a, 0)),
                    ),
                }
                for a in sorted(index.colors)
            ]
            self._send(200, {"accessions": accs})
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        try:
            payload = json.loads(self.rfile.read(n))
        except json.JSONDecodeError:
            self._send(400, {"error": "bad json"})
            return
        try:
            with _State.lock:
                if self.path == "/search":
                    self._send(200, _search_payload(payload))
                elif self.path == "/classify":
                    self._send(200, _classify_payload(payload))
                else:
                    self._send(404, {"error": "not found"})
        except Exception as e:  # surface errors to the client
            self._send(500, {"error": str(e)})


def make_server(bigsi_path: str, port: int, host: str = "127.0.0.1"):
    import threading

    from .engine import QueryEngine
    from .index.bigsi import BigsiIndex

    _State.engine = QueryEngine(BigsiIndex.load(bigsi_path))
    _State.lock = threading.Lock()
    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser(prog="colorid-tpu serve")
    p.add_argument("-b", "--bigsi", required=True)
    p.add_argument("--port", type=int, default=8750)
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)
    srv = make_server(args.bigsi, args.port, args.host)
    print(f"serving {args.bigsi} on {args.host}:{args.port}", file=sys.stderr)
    srv.serve_forever()


if __name__ == "__main__":
    main()
