"""Pinned golden outputs over the bundled 4-phage index + a deterministic
synthetic read set (seeded). These values were produced by this framework
and pin its behavior against regressions — the analogue of the reference's
test.sh field-by-field assertion (its own golden fastq is a missing blob).

Any intentional semantic change must update these values consciously.
"""

import contextlib
import hashlib
import io

import pytest

from colorid_tpu.cli import main
from tests.test_cli_e2e import _ref_manifest, _synth_fastq

SEARCH_GOLDEN = ["QUERY\t33291\tListeria_phage_B056\t0.99\t6.68\t6\t26305"]
PERFECT_GOLDEN = ["Listeria_phage_B056\t32634\t1.00"]
# default (FnvHashSet-order emulation, reference semantics): junk reads hit
# the break-on-absent cut at fnv-order positions, so the rows differ from
# the first-occurrence variant pinned below
READID_MD5 = "bec79247f2e7dc4ac38df8267bcda955"
COUNTS_GOLDEN = ["Listeria_phage_B056\t2580", "no_hits\t94", "reject\t326"]
# COLORID_FNV_ORDER=0 (deterministic first-occurrence order escape hatch)
READID_MD5_FIRSTOCC = "86dd755f7da081d5dee1e2c0e02c6425"
COUNTS_GOLDEN_FIRSTOCC = [
    "Listeria_phage_B056\t2635", "no_hits\t100", "reject\t265",
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    man = _ref_manifest(tmp)
    prefix = str(tmp / "phage")
    with contextlib.redirect_stdout(io.StringIO()):
        main(["build", "-s", "750000", "-n", "4", "-k", "27", "-b", prefix,
              "-r", man])
    fq = _synth_fastq(tmp)
    return tmp, prefix + ".bxi", fq


def test_search_golden(setup, capsys):
    _tmp, bxi, fq = setup
    main(["search", "-b", bxi, "-q", fq, "-f", "1"])
    out = [
        l.replace(fq, "QUERY")
        for l in capsys.readouterr().out.splitlines()
        if "\t" in l
    ]
    assert sorted(out) == SEARCH_GOLDEN


def test_perfect_golden(setup, capsys):
    _tmp, bxi, _fq = setup
    main([
        "search", "-b", bxi, "-s",
        "-q", "/root/reference/test_data/refs/Listeria_phage_B056.fasta",
    ])
    out = sorted(
        l.split("\t", 1)[1]
        for l in capsys.readouterr().out.splitlines()
        if "\t" in l
    )
    assert out == PERFECT_GOLDEN


def test_read_id_golden(setup):
    tmp, bxi, fq = setup
    prefix = str(tmp / "cls")
    main(["read_id", "-b", bxi, "-q", fq, "-n", prefix, "-d", "10"])
    rows = open(prefix + "_reads.txt").read()
    assert hashlib.md5(rows.encode()).hexdigest() == READID_MD5
    counts = sorted(open(prefix + "_counts.txt").read().splitlines())
    assert counts == COUNTS_GOLDEN


def test_read_id_golden_first_occurrence(setup, monkeypatch):
    monkeypatch.setenv("COLORID_FNV_ORDER", "0")
    tmp, bxi, fq = setup
    prefix = str(tmp / "cls_fo")
    main(["read_id", "-b", bxi, "-q", fq, "-n", prefix, "-d", "10"])
    rows = open(prefix + "_reads.txt").read()
    assert hashlib.md5(rows.encode()).hexdigest() == READID_MD5_FIRSTOCC
    counts = sorted(open(prefix + "_counts.txt").read().splitlines())
    assert counts == COUNTS_GOLDEN_FIRSTOCC
