"""End-to-end CLI test modeled on the reference's test.sh: build the phage
index, classify synthetic reads, search, filter — asserting format and
self-consistency (golden values are pinned in test_golden.py)."""

import gzip
import os

import numpy as np
import pytest

from colorid_tpu.cli import main
from colorid_tpu.core.fastx import read_fasta
from tests import oracle

REF_FILE = "/root/reference/test_data/ref_file.txt"
REFS = "/root/reference/test_data/refs"


def _ref_manifest(tmp_path):
    # rewrite manifest paths relative to /root/reference
    lines = []
    with open(REF_FILE) as f:
        for line in f:
            name, p = line.strip().split("\t")
            lines.append(f"{name}\t/root/reference/test_data/{p[12:]}")
    man = tmp_path / "ref_file.txt"
    man.write_text("\n".join(lines) + "\n")
    return str(man)


def _synth_fastq(tmp_path, n_reads=3000, seed=0):
    rng = np.random.default_rng(seed)
    g = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta"))
    path = tmp_path / "reads.fastq.gz"
    with gzip.open(path, "wt") as f:
        for i in range(n_reads):
            start = rng.integers(0, len(g) - 100)
            read = g[start : start + 100]
            if rng.random() < 0.5:
                read = oracle.revcomp(read)
            f.write(f"@read{i} extra\n{read}\n+\n{'I' * 100}\n")
    return str(path)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    man = _ref_manifest(tmp_path)
    prefix = str(tmp_path / "phage")
    main([
        "build", "-s", "750000", "-n", "4", "-k", "27",
        "-b", prefix, "-r", man,
    ])
    assert os.path.exists(prefix + ".bxi")
    return tmp_path, prefix + ".bxi"


def test_search_f1(built, capsys):
    tmp_path, bxi = built
    fq = _synth_fastq(tmp_path)
    main(["search", "-b", bxi, "-q", fq, "-f", "1"])
    out = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    rows = {l.split("\t")[2]: l.split("\t") for l in out}
    assert "Listeria_phage_B056" in rows
    r = rows["Listeria_phage_B056"]
    assert r[0] == fq
    assert float(r[3]) > 0.9  # shared fraction ~1.0
    assert int(r[6]) > 0  # uniq kmers


def test_perfect_search_all_refs(built, capsys):
    tmp_path, bxi = built
    for name in ["B021", "B051", "B056", "B545"]:
        main([
            "search", "-b", bxi, "-s",
            "-q", f"{REFS}/Listeria_phage_{name}.fasta",
        ])
        out = capsys.readouterr().out
        hits = [l.split("\t")[1] for l in out.splitlines() if "\t" in l]
        assert f"Listeria_phage_{name}" in hits


def test_gene_search(built, capsys, tmp_path):
    _tmp, bxi = built
    g = "".join(read_fasta(f"{REFS}/Listeria_phage_B056.fasta"))
    gene = tmp_path / "gene.fasta"
    gene.write_text(f">gene1\n{g[1000:1500]}\n")
    main(["search", "-b", bxi, "-g", "-q", str(gene)])
    out = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert any(
        l.split("\t")[1] == "Listeria_phage_B056" and float(l.split("\t")[3]) >= 0.99
        for l in out
    )


def test_read_id_and_filter(built, capsys):
    tmp_path, bxi = built
    fq = _synth_fastq(tmp_path, n_reads=300, seed=3)
    prefix = str(tmp_path / "cls")
    main(["read_id", "-b", bxi, "-q", fq, "-n", prefix, "-d", "10"])
    reads_txt = prefix + "_reads.txt"
    rows = [l.split("\t") for l in open(reads_txt).read().splitlines()]
    assert len(rows) == 300
    acc = [r for r in rows if r[4] == "accept" and r[1] == "Listeria_phage_B056"]
    assert len(acc) >= 200  # most reads resolve uniquely
    # everything else should at least involve B056 (ties with sibling phages)
    other = [r for r in rows if "Listeria_phage_B056" not in r[1]]
    assert len(other) <= 20  # junction reads from record concatenation
    counts = dict(
        l.split("\t") for l in open(prefix + "_counts.txt").read().splitlines()
    )
    assert int(counts["Listeria_phage_B056"]) == len(acc)
    # read_filter keeps exactly the accepted+matching reads
    fprefix = str(tmp_path / "filt")
    main([
        "read_filter", "-c", reads_txt, "-f", fq,
        "-t", "Listeria_phage_B056", "-p", fprefix,
    ])
    outfq = f"{fprefix}_Listeria_phage_B056.fq.gz"
    with gzip.open(outfq, "rt") as f:
        flines = f.read().splitlines()
    kept_ids = {flines[i].split(" ")[0] for i in range(0, len(flines), 4)}
    want_ids = {
        r[0].split(" ")[0] for r in rows if "Listeria_phage_B056" in r[1]
    }
    assert kept_ids == want_ids


def test_info(built, capsys):
    _tmp, bxi = built
    main(["info", "-b", bxi])
    out = capsys.readouterr().out
    assert "Bloomfilter-size: 750000" in out
    assert "Number of accessions in index: 4" in out
    for name in ["B021", "B051", "B056", "B545"]:
        assert f"Listeria_phage_{name}" in out


def test_batch_id(built, capsys, tmp_path, monkeypatch):
    tmp, bxi = built
    fq = _synth_fastq(tmp, n_reads=40, seed=9)
    man = tmp_path / "samples.txt"
    man.write_text(f"sampleA\t{fq}\n")
    monkeypatch.chdir(tmp_path)
    main(["batch_id", "-b", bxi, "-q", str(man), "-T", "t1"])
    assert os.path.exists("sampleA_t1_reads.txt")
    assert os.path.exists("sampleA_t1_counts.txt")
