"""Device-resident fastq search (COLORID_SEARCH_READS) TSV parity.

batch_search on fastq.gz now streams 2-bit packed reads + a validity
bitplane to the device, which counts, auto-cutoff-filters and queries
without any per-k-mer host work; its TSV must be identical to the
host-counting path, for both explicit -f and the auto-cutoff, with
N-masked bases and variable-length reads.
"""

import gzip
import os

import numpy as np
import pytest

from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.engine import QueryEngine
from colorid_tpu.pipelines.build import build_index
from colorid_tpu.pipelines.search import batch_search

REFS = "/root/reference/test_data/refs"


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dsearch")
    refs = {
        f[:-6]: [os.path.join(REFS, f)]
        for f in sorted(os.listdir(REFS))
        if f.endswith(".fasta")
    }
    rng = np.random.default_rng(5)
    gs = ["".join(read_fasta(p[0])).upper() for p in refs.values()]
    fq1 = str(tmp / "q1.fq.gz")
    fq2 = str(tmp / "q2.fq.gz")
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    with gzip.open(fq1, "wt") as f1, gzip.open(fq2, "wt") as f2:
        for i in range(1500):
            g = gs[int(rng.integers(0, len(gs)))]
            st = int(rng.integers(0, len(g) - 500))
            r = list(g[st : st + 150])
            q = ["I"] * 150
            if i % 6 == 0:
                for p_ in rng.integers(0, 150, 4):
                    q[int(p_)] = "#"  # below Q15 -> masked to N
            if i % 17 == 0:
                r, q = r[:80], q[:80]  # variable lengths
            f1.write(f"@r{i}\n{''.join(r)}\n+\n{''.join(q)}\n")
            r2 = g[st + 350 : st + 500].encode().translate(comp)[::-1].decode()
            f2.write(f"@r{i}\n{r2}\n+\n{'I' * 150}\n")
    return refs, fq1, fq2


@pytest.mark.parametrize("blocked", [False, True])
@pytest.mark.parametrize("ft", [-1, 1])
def test_device_search_tsv_parity(fixture, blocked, ft):
    refs, fq1, fq2 = fixture
    index = build_index(refs, 750_000, 4, 27, verbose=False, blocked=blocked)
    engine = QueryEngine(index)
    outs = {}
    for env in ("0", "1"):
        os.environ["COLORID_SEARCH_READS"] = env
        try:
            outs[env] = batch_search([fq1], [], engine, filter_t=ft)
        finally:
            del os.environ["COLORID_SEARCH_READS"]
    assert outs["0"] == outs["1"]
    assert outs["1"]  # non-empty result rows


def test_device_search_pe_parity(fixture):
    refs, fq1, fq2 = fixture
    index = build_index(refs, 750_000, 4, 27, verbose=False, blocked=True)
    engine = QueryEngine(index)
    outs = {}
    for env in ("0", "1"):
        os.environ["COLORID_SEARCH_READS"] = env
        try:
            outs[env] = batch_search([fq1], [fq2], engine, filter_t=1)
        finally:
            del os.environ["COLORID_SEARCH_READS"]
    assert outs["0"] == outs["1"]
    assert outs["1"]
