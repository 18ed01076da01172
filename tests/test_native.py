"""Native (C++) vs pure-Python ingestion parity.

The native library must produce byte-identical databases and models — same
encode table, same SplitMix64 ambiguity/separator randomization, same float
narrowing — so the two paths are interchangeable (SURVEY.md §2.4).
"""

import os
import subprocess

import numpy as np
import pytest

from havac_tpu import native
from havac_tpu.io.fasta import load_fasta_database
from havac_tpu.io.hmm import read_hmm, write_hmm
from havac_tpu.testing.generator import generate_planted_fixture


@pytest.fixture(scope="session", autouse=True)
def built_native():
    if not native.available():
        assert native.build(), "failed to build libhavac_native.so"
        # reset the failed-load latch
        native._load_failed = False
    assert native.available()


def test_fasta_parity_with_ambiguity_codes(tmp_path):
    fa = tmp_path / "db.fasta"
    fa.write_text(
        ">seq1 first description\n"
        "ACGTacgtUuNnRYSWKMryswkm\n"
        "GGGCCC\n"
        ">seq2\n"
        "TTTTXXXBDHV\n"
        ">empty\n"
        ">seq3\n"
        "acgt\n")
    for pad in (1, 1024):
        dn = load_fasta_database(str(fa), pad_multiple=pad, native="always")
        dp = load_fasta_database(str(fa), pad_multiple=pad, native="never")
        assert dn.names == dp.names
        np.testing.assert_array_equal(dn.lengths, dp.lengths)
        np.testing.assert_array_equal(dn.starts, dp.starts)
        np.testing.assert_array_equal(dn.codes, dp.codes)


def test_fasta_parity_large_random(tmp_path):
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGTNRYSWKMacgtn", dtype=np.uint8)
    recs = []
    for i in range(20):
        n = int(rng.integers(1, 5000))
        recs.append((f"s{i}", bytes(rng.choice(alpha, size=n)).decode()))
    fa = tmp_path / "big.fasta"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in recs))
    dn = load_fasta_database(str(fa), pad_multiple=3072, native="always")
    dp = load_fasta_database(str(fa), pad_multiple=3072, native="never")
    np.testing.assert_array_equal(dn.codes, dp.codes)
    np.testing.assert_array_equal(dn.starts, dp.starts)


def test_hmm_parity(tmp_path):
    models, _ = generate_planted_fixture(seed=3, model_length=85,
                                         sequence_length=100, num_models=4)
    # exercise '*' tokens too
    models[1].match_scores[7, 2] = np.inf
    path = tmp_path / "m.hmm"
    write_hmm(models, str(path))
    mn = read_hmm(str(path), native="always")
    mp = read_hmm(str(path), native="never")
    assert len(mn) == len(mp) == 4
    for a, b in zip(mn, mp):
        assert a.name == b.name
        assert a.accession == b.accession
        assert a.model_length == b.model_length
        assert a.max_length == b.max_length
        assert a.alphabet == b.alphabet
        assert a.msv_mu == b.msv_mu
        assert a.msv_lambda == b.msv_lambda
        np.testing.assert_array_equal(a.match_scores, b.match_scores)


def test_native_error_reporting(tmp_path):
    bad = tmp_path / "bad.hmm"
    bad.write_text("HMMER3/f\nNAME x\n")  # no HMM section
    with pytest.raises(native.NativeParseError):
        native.read_hmm_native(str(bad))
    badfa = tmp_path / "bad.fasta"
    badfa.write_text("ACGT\n>late\nACGT\n")
    with pytest.raises(native.NativeParseError):
        native.read_fasta_encoded(str(badfa))
