"""Coverage for the remaining pipeline surfaces: minimizer (.mxi) indexes,
paired-end search, paired-end read_filter (+ exclude), multifasta perfect
search, high-mem load mode, BloomFilter API, MLST post-processing."""

import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

from colorid_tpu.cli import main
from colorid_tpu.core.bloom import BloomFilter
from colorid_tpu.core.fastx import read_fasta
from colorid_tpu.index.bigsi import BigsiIndex
from tests import oracle
from tests.test_cli_e2e import REFS, _ref_manifest


def _pe_fastqs(tmp_path, n=300, seed=1):
    rng = np.random.default_rng(seed)
    g = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta"))
    p1, p2 = tmp_path / "r1.fq.gz", tmp_path / "r2.fq.gz"
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for i in range(n):
            start = rng.integers(0, len(g) - 400)
            r1 = g[start : start + 120]
            r2 = oracle.revcomp(g[start + 250 : start + 370])
            f1.write(f"@p{i} x\n{r1}\n+\n{'I' * 120}\n")
            f2.write(f"@p{i} x\n{r2}\n+\n{'I' * 120}\n")
    return str(p1), str(p2)


def test_minimizer_index_roundtrip(tmp_path, capsys):
    man = _ref_manifest(tmp_path)
    prefix = str(tmp_path / "mini")
    main([
        "build", "-s", "400000", "-n", "3", "-k", "27", "-m", "-v", "15",
        "-b", prefix, "-r", man,
    ])
    mxi = prefix + ".mxi"
    assert os.path.exists(mxi)
    idx = BigsiIndex.load(mxi)
    assert idx.m_size == 15
    # search refuses .mxi (main.rs:569-572)
    main(["search", "-b", mxi, "-q", f"{REFS}/Listeria_phage_B056.fasta"])
    assert "not available" in capsys.readouterr().err
    # read_id works against the minimizer index
    p1, p2 = _pe_fastqs(tmp_path, n=100)
    pre = str(tmp_path / "m")
    main(["read_id", "-b", mxi, "-q", p1, p2, "-n", pre])
    rows = [l.split("\t") for l in open(pre + "_reads.txt").read().splitlines()]
    assert len(rows) == 100
    good = [r for r in rows if r[1] == "Listeria_phage_B056" and r[4] == "accept"]
    assert len(good) >= 60


def test_pe_search(tmp_path, capsys):
    man = _ref_manifest(tmp_path)
    prefix = str(tmp_path / "idx")
    main(["build", "-s", "750000", "-n", "4", "-k", "27", "-b", prefix, "-r", man])
    p1, p2 = _pe_fastqs(tmp_path, n=3000)
    main(["search", "-b", prefix + ".bxi", "-q", p1, "-r", p2, "-f", "1"])
    out = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    rows = {l.split("\t")[2]: l.split("\t") for l in out}
    assert "Listeria_phage_B056" in rows
    assert float(rows["Listeria_phage_B056"][3]) > 0.5


def test_pe_read_filter_and_exclude(tmp_path, capsys):
    man = _ref_manifest(tmp_path)
    prefix = str(tmp_path / "idx")
    main(["build", "-s", "750000", "-n", "4", "-k", "27", "-b", prefix, "-r", man])
    p1, p2 = _pe_fastqs(tmp_path, n=120)
    pre = str(tmp_path / "c")
    main(["read_id", "-b", prefix + ".bxi", "-q", p1, p2, "-n", pre, "-H"])
    reads_txt = pre + "_reads.txt"
    rows = [l.split("\t") for l in open(reads_txt).read().splitlines()]
    matching = {r[0].split(" ")[0] for r in rows if "B056" in r[1]}
    fp = str(tmp_path / "keep")
    main(["read_filter", "-c", reads_txt, "-f", p1, p2, "-t", "B056", "-p", fp])
    with gzip.open(f"{fp}_B056_R1.fq.gz", "rt") as f:
        kept = f.read().splitlines()
    kept_ids = {kept[i].split(" ")[0] for i in range(0, len(kept), 4)}
    assert kept_ids == matching
    # R2 mirrors R1
    with gzip.open(f"{fp}_B056_R2.fq.gz", "rt") as f:
        kept2 = f.read().splitlines()
    assert len(kept2) == len(kept)
    # exclude mode keeps the complement
    fx = str(tmp_path / "excl")
    main([
        "read_filter", "-c", reads_txt, "-f", p1, p2, "-t", "B056",
        "-p", fx, "-e",
    ])
    with gzip.open(f"{fx}_B056_R1.fq.gz", "rt") as f:
        excl = f.read().splitlines()
    excl_ids = {excl[i].split(" ")[0] for i in range(0, len(excl), 4)}
    assert excl_ids.isdisjoint(matching)
    assert len(excl_ids) + len(kept_ids) == 120


def test_perfect_multifasta(tmp_path, capsys):
    man = _ref_manifest(tmp_path)
    prefix = str(tmp_path / "idx")
    main(["build", "-s", "750000", "-n", "4", "-k", "27", "-b", prefix, "-r", man])
    g = read_fasta(f"{REFS}/Listeria_phage_B056.fasta")
    mf = tmp_path / "mf.fasta"
    mf.write_text(f">q1\n{g[3]}\n>tiny\nACGT\n>q2\n{g[5]}\n")
    main(["search", "-b", prefix + ".bxi", "-s", "-m", "-q", str(mf)])
    out = capsys.readouterr().out.splitlines()
    q1 = [l for l in out if l.startswith("q1\t")]
    assert any("Listeria_phage_B056" in l for l in q1)
    assert any("no kmers in query 'tiny'" in l for l in out)


def test_bloom_filter_api():
    bf = BloomFilter(250_000, 4)
    bf.insert("ATGC")
    assert bf.contains("ATGC")
    assert not bf.contains("ATGT")


def test_mlst_script(tmp_path):
    search_out = tmp_path / "mlst.tsv"
    search_out.write_text(
        "abcZ_1\tsampleA\t500\t1.00\n"
        "adk_3\tsampleA\t480\t1.00\n"
        "adk_3\tsampleB\t480\t1.00\n"
        "adk_7\tsampleB\t480\t1.00\n"
    )
    prefix = str(tmp_path / "out")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "workflows/MLST/process_mlst.py"),
            str(search_out), prefix,
        ],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    report = open(prefix + ".report.out").read()
    assert "sampleA; total: 2/2, multiple: 0" in report
    assert "sampleB; total: 1/2, multiple: 1" in report
    raw = open(prefix + ".raw.tsv").read().splitlines()
    assert raw[0] == "\tabcZ\tadk"
    rows = {l.split("\t")[0]: l.split("\t") for l in raw[1:]}
    assert rows["sampleA"] == ["sampleA", "1", "3"]
    assert rows["sampleB"] == ["sampleB", "NA", "NA"]
    det = open(prefix + ".detailed.tsv").read()
    assert "MULTI" in det and "NOT_CALLED" in det


def test_multi_query_files(tmp_path, capsys):
    man = _ref_manifest(tmp_path)
    prefix = str(tmp_path / "idx")
    main(["build", "-s", "750000", "-n", "4", "-k", "27", "-b", prefix, "-r", man])
    g56 = read_fasta(f"{REFS}/Listeria_phage_B056.fasta")
    g21 = read_fasta(f"{REFS}/Listeria_phage_B021.fasta")
    q1 = tmp_path / "q1.fasta"
    q2 = tmp_path / "q2.fasta"
    q1.write_text("".join(f">r\n{s}\n" for s in g56))
    q2.write_text("".join(f">r\n{s}\n" for s in g21))
    main(["search", "-b", prefix + ".bxi", "-q", str(q1), str(q2), "-f", "0"])
    out = [l.split("\t") for l in capsys.readouterr().out.splitlines() if "\t" in l]
    by_query = {}
    for r in out:
        by_query.setdefault(r[0], set()).add(r[2])
    assert "Listeria_phage_B056" in by_query[str(q1)]
    assert "Listeria_phage_B021" in by_query[str(q2)]


def test_gene_search_on_fastq(tmp_path, capsys):
    man = _ref_manifest(tmp_path)
    prefix = str(tmp_path / "idx")
    main(["build", "-s", "750000", "-n", "4", "-k", "27", "-b", prefix, "-r", man])
    p1, _p2 = _pe_fastqs(tmp_path, n=3000)
    # gz + -g: filtering still uses -f/auto (batch_search_pe.rs:34-39) but
    # the report is gene-style (4 columns, frac >= cov)
    main(["search", "-b", prefix + ".bxi", "-g", "-q", p1, "-f", "1",
          "-p", "0.1"])
    out = [l.split("\t") for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert out and all(len(r) == 4 for r in out)
    assert any(r[1] == "Listeria_phage_B056" for r in out)


def test_softmasked_genome_e2e(tmp_path, capsys):
    """A genome with lowercase (soft-masked) regions flows through the exact
    numpy paths end-to-end; lowercase query k-mers only match lowercase
    index k-mers when case-matched — except the fasta build path uppercases
    (kmerize_vector), so uppercase queries still hit."""
    rng = np.random.default_rng(21)
    g = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta"))[:20000]
    soft = g[:5000].lower() + g[5000:]
    fa = tmp_path / "soft.fasta"
    fa.write_text(f">soft\n{soft}\n")
    man = tmp_path / "refs.txt"
    man.write_text(f"softy\t{fa}\n")
    prefix = str(tmp_path / "softidx")
    main(["build", "-s", "200000", "-n", "3", "-k", "21", "-b", prefix,
          "-r", str(man)])
    # uppercase query hits (the index was uppercased at build)
    q = tmp_path / "q.fasta"
    q.write_text(f">q\n{g[:8000].upper()}\n")
    main(["search", "-b", prefix + ".bxi", "-q", str(q), "-f", "0", "-p", "0.1"])
    out = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert any(r.split("\t")[2] == "softy" for r in out)
    # mixed-case fastq reads classify via the exact per-read path
    import gzip as _gz

    fq = tmp_path / "soft.fq.gz"
    with _gz.open(fq, "wt") as f:
        for i in range(60):
            s = int(rng.integers(0, len(soft) - 100))
            f.write(f"@s{i}\n{soft[s:s+100]}\n+\n{'I'*100}\n")
    pre = str(tmp_path / "softcls")
    main(["read_id", "-b", prefix + ".bxi", "-q", str(fq), "-n", pre])
    rows = [l.split("\t") for l in open(pre + "_reads.txt").read().splitlines()]
    assert len(rows) == 60
    # uppercase-region reads accept; lowercase-region reads miss (their
    # k-mers hash with lowercase bytes, the index holds uppercase)
    acc = [r for r in rows if r[1] == "softy" and r[4] == "accept"]
    assert len(acc) >= 30
