"""Randomized end-to-end property tests across the read_id flag matrix
(VERDICT r3 #8): k in {15, 21, 27, 31}, Q in {0, 15}, SE/PE, d in {1, 10},
B in {0, 3}, minimizer m=15 — each dimension's values covered at least
once on fresh random corpora, with the full file-level pipeline
(fastq.gz streaming + quality masking + classification + TSV write)
checked row-by-row against the literal per-read oracle
(tests/test_read_id.py::oracle_classify over tests/oracle.py masking)."""

import gzip

import numpy as np
import pytest

xxhash = pytest.importorskip("xxhash")

from colorid_tpu.engine import QueryEngine
from colorid_tpu.pipelines.build import build_index
from colorid_tpu.pipelines.read_id import read_id
from tests import oracle
from tests.test_read_id import oracle_classify

BLOOM = 100_000
H = 3

#          k,  Q, pe,    d,  B, m
COMBOS = [
    (15,  0, False,  1, 3,  0),
    (21, 15, True,   1, 0,  0),
    (27, 15, False, 10, 3,  0),
    (31,  0, True,  10, 0,  0),
    (21, 15, False,  1, 3, 15),
    (31, 15, True,   1, 3,  0),
]


def _corpus(rng, k):
    genomes = {
        f"g{i}": "".join("ACGT"[c] for c in rng.integers(0, 4, 2500))
        for i in range(3)
    }
    return genomes


def _mutate(rng, s, rate):
    out = list(s)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = "ACGTN"[rng.integers(0, 5)]
    return "".join(out)


def _qual(rng, n):
    """Mostly-good qualities with ~12% below the Q=15 threshold."""
    lows = rng.random(n) < 0.12
    goods = rng.integers(25, 40, n)
    bads = rng.integers(0, 15, n)
    return "".join(
        chr(33 + int(b if lo else g))
        for lo, g, b in zip(lows, goods, bads)
    )


@pytest.mark.parametrize("k,Q,pe,d,B,m", COMBOS)
def test_read_id_matrix_matches_oracle(tmp_path, k, Q, pe, d, B, m):
    rng = np.random.default_rng(1000 * k + 10 * Q + d + B + m)
    genomes = _corpus(rng, k)
    ref_dir = tmp_path / "refs"
    ref_dir.mkdir()
    ref_map = {}
    for name, g in genomes.items():
        p = ref_dir / f"{name}.fasta"
        p.write_text(f">{name}\n{g}\n")
        ref_map[name] = [str(p)]
    index = build_index(
        ref_map, BLOOM, H, k, m_size=m, verbose=False
    )
    engine = QueryEngine(index)

    L = 100
    reads = []
    for i in range(36):
        g = genomes[f"g{i % 3}"]
        s = int(rng.integers(0, len(g) - 2 * L - 50))
        r1 = _mutate(rng, g[s : s + L], 0.02)
        q1 = _qual(rng, L)
        if pe:
            r2 = oracle.revcomp(g[s + L + 50 : s + 2 * L + 50])
            r2 = _mutate(rng, r2, 0.02)
            q2 = _qual(rng, L)
            reads.append((f"@r{i}", r1, q1, r2, q2))
        else:
            reads.append((f"@r{i}", r1, q1, None, None))
    # junk + too-short reads exercise the no_hits/too_short rows
    reads.append(("@junk", "".join("ACGT"[c] for c in rng.integers(0, 4, L)),
                  "I" * L, None, None) if not pe else
                 ("@junk", "".join("ACGT"[c] for c in rng.integers(0, 4, L)),
                  "I" * L,
                  "".join("ACGT"[c] for c in rng.integers(0, 4, L)), "I" * L))
    reads.append(("@short", "ACG", "III", None, None) if not pe else
                 ("@short", "ACG", "III", "ACG", "III"))

    fq1 = tmp_path / "r1.fq.gz"
    fq2 = tmp_path / "r2.fq.gz"
    with gzip.open(fq1, "wt") as f1:
        for rid, r1, q1, _r2, _q2 in reads:
            f1.write(f"{rid}\n{r1}\n+\n{q1}\n")
    if pe:
        with gzip.open(fq2, "wt") as f2:
            for rid, _r1, _q1, r2, q2 in reads:
                f2.write(f"{rid}\n{r2}\n+\n{q2}\n")

    prefix = str(tmp_path / "out")
    files = [str(fq1), str(fq2)] if pe else [str(fq1)]
    read_id(
        files, engine, prefix=prefix, d=d, fp_correct=1e-3,
        qual_offset=Q, start_sample=B,
    )
    got = [l.rstrip("\n") for l in open(prefix + "_reads.txt")]

    want = []
    for rid, r1, q1, r2, q2 in reads:
        seqs = [oracle.qual_mask(r1, q1, Q)]
        if pe:
            seqs.append(oracle.qual_mask(r2, q2, Q))
        row = oracle_classify(rid, seqs, index, d, 1e-3, B)
        want.append("\t".join(str(x) for x in row))
    assert got == want
