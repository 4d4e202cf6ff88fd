"""Device scatter-OR build vs the host numpy build."""

import numpy as np

from colorid_tpu.ops.build_ops import build_matrix_device
from colorid_tpu.pipelines.build import build_index

REFS = "/root/reference/test_data/refs"


def test_scatter_or_matches_host():
    rng = np.random.default_rng(0)
    R, C = 10000, 70  # spans 3 words
    row_lists = [
        rng.integers(0, R, rng.integers(0, 500)).astype(np.int32)
        for _ in range(C)
    ]
    got = np.asarray(build_matrix_device(row_lists, R, pad_to=1024))
    W = (C + 31) // 32
    want = np.zeros((R, W), dtype=np.uint32)
    for c, rows in enumerate(row_lists):
        b = np.zeros(R, dtype=bool)
        b[rows] = True
        want[:, c // 32] |= b.astype(np.uint32) << np.uint32(c % 32)
    np.testing.assert_array_equal(got, want)


def test_build_index_device_matches_host():
    ref_map = {
        "B021": [f"{REFS}/Listeria_phage_B021.fasta"],
        "B056": [f"{REFS}/Listeria_phage_B056.fasta"],
    }
    host = build_index(ref_map, 100000, 3, 21, verbose=False, device=False)
    dev = build_index(ref_map, 100000, 3, 21, verbose=False, device=True)
    np.testing.assert_array_equal(host.matrix, dev.matrix)
    assert host.n_ref_kmers == dev.n_ref_kmers


def test_build_checkpoint_resume(tmp_path, monkeypatch):
    ref_map = {
        "B021": [f"{REFS}/Listeria_phage_B021.fasta"],
        "B056": [f"{REFS}/Listeria_phage_B056.fasta"],
    }
    ck = str(tmp_path / "ck")
    a = build_index(ref_map, 80000, 3, 21, verbose=False, checkpoint_dir=ck)
    # second run must not re-count: poison accession_kmers
    import colorid_tpu.pipelines.build as B

    def boom(*a, **k):
        raise AssertionError("re-counted despite checkpoint")

    monkeypatch.setattr(B, "accession_kmers", boom)
    b = build_index(ref_map, 80000, 3, 21, verbose=False, checkpoint_dir=ck)
    np.testing.assert_array_equal(a.matrix, b.matrix)
    assert a.n_ref_kmers == b.n_ref_kmers
    # parameter mismatch invalidates the checkpoint
    monkeypatch.undo()
    c = build_index(ref_map, 80000, 4, 21, verbose=False, checkpoint_dir=ck)
    assert c.num_hash == 4


def test_build_threads_matches_serial():
    ref_map = {
        "B021": [f"{REFS}/Listeria_phage_B021.fasta"],
        "B051": [f"{REFS}/Listeria_phage_B051.fasta"],
        "B056": [f"{REFS}/Listeria_phage_B056.fasta"],
    }
    a = build_index(ref_map, 90000, 3, 21, verbose=False)
    b = build_index(ref_map, 90000, 3, 21, verbose=False, threads=3)
    np.testing.assert_array_equal(a.matrix, b.matrix)
    assert a.n_ref_kmers == b.n_ref_kmers
