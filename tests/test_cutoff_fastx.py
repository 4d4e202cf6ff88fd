import gzip
import random

import numpy as np
import pytest

from colorid_tpu.core.cutoff import auto_cutoff, clean_counts
from colorid_tpu.core.fastx import (
    read_fasta,
    read_fasta_mf,
    stream_fasta_records,
    stream_fastq,
    stream_fastq_pe,
)
from colorid_tpu.core.dna import to_str
from tests import oracle


def test_auto_cutoff_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(30):
        # synthetic coverage distribution: error peak at 1 + signal peak
        n = rng.integers(200, 2000)
        signal = rng.poisson(rng.integers(5, 60), n // 2) + 1
        noise = rng.integers(1, 3, n - n // 2)
        counts = np.concatenate([signal, noise]).astype(np.int64)
        if counts.max() <= 3:
            continue
        assert auto_cutoff(counts) == oracle.auto_cutoff(counts.tolist())


def test_auto_cutoff_low_mean_zero():
    counts = np.ones(100, dtype=np.int64)
    assert auto_cutoff(counts) == 0


def test_auto_cutoff_narrow_raises():
    with pytest.raises(ValueError):
        auto_cutoff(np.array([3, 3, 3, 3]))


def test_clean_counts_strict():
    keys = np.arange(12, dtype=np.uint8).reshape(4, 3)
    counts = np.array([1, 2, 3, 2])
    k2, c2 = clean_counts(keys, counts, 2)
    assert c2.tolist() == [3]


def test_read_fasta_quirks(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(">a\nACGT\nTTTT\n>b desc\nGGGG\n")
    assert read_fasta(str(p)) == ["ACGTTTTT", "GGGG"]
    labels, seqs = read_fasta_mf(str(p))
    assert labels == ["a", "b desc"]
    assert seqs == ["ACGTTTTT", "GGGG"]
    # header-anywhere quirk: a line containing '>' mid-line is a header
    p2 = tmp_path / "y.fasta"
    p2.write_text(">a\nAC>GT\nTTTT\n")
    assert read_fasta(str(p2)) == ["TTTT"]


def test_stream_fastq(tmp_path):
    p = tmp_path / "r.fastq.gz"
    with gzip.open(p, "wt") as f:
        f.write("@r1\nACGT\n+\nIII!\n@r2\nTTTT\n+\nIIII\n")
    reads = list(stream_fastq(str(p), qual_offset=15))
    assert reads[0][0] == "@r1"
    assert to_str(reads[0][1]) == "ACGN"
    assert to_str(reads[1][1]) == "TTTT"


def test_stream_fastq_pe_stops_on_short_r2(tmp_path):
    p1 = tmp_path / "r1.fastq.gz"
    p2 = tmp_path / "r2.fastq.gz"
    with gzip.open(p1, "wt") as f:
        f.write("@r1\nACGT\n+\nIIII\n@r2\nTTTT\n+\nIIII\n")
    with gzip.open(p2, "wt") as f:
        f.write("@r1\nCCCC\n+\nIIII\n")
    reads = list(stream_fastq_pe(str(p1), str(p2), qual_offset=0))
    assert len(reads) == 1
    assert to_str(reads[0][1]) == "ACGT"
    assert to_str(reads[0][2]) == "CCCC"


def test_stream_fasta_records_keeps_newlines(tmp_path):
    p = tmp_path / "q.fasta"
    p.write_text(">q1\nACGT\nTTTT\n>q2\nGGGG\n")
    recs = list(stream_fasta_records(str(p)))
    assert recs[0] == (">q1", "ACGT\nTTTT\n")
    assert recs[1] == (">q2", "GGGG\n")
