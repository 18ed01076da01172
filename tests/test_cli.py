"""CLI subcommand coverage (in-process main(), CPU/XLA backend)."""

import json

import numpy as np
import pytest

from havac_tpu.engine.cli import main
from havac_tpu.io.hmm import write_hmm
from havac_tpu.testing.generator import generate_planted_fixture


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    models, recs = generate_planted_fixture(
        seed=81, model_length=36, sequence_length=2500, num_models=2)
    write_hmm(models, str(d / "m.hmm"))
    (d / "db.fasta").write_text(
        "".join(f">{n}\n{s}\n" for n, s in recs))
    (d / "db2.fasta").write_text(
        "".join(f">{n}2\n{s}\n" for n, s in recs))
    return d


BASE = ["--backend", "xla", "--pvalue", "0.05"]


def test_cli_search(workdir, capsys):
    out = workdir / "hits.tsv"
    rc = main(["search", "--hmm", str(workdir / "m.hmm"),
               "--fasta", str(workdir / "db.fasta"), *BASE,
               "--strand", "both", "--out", str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("#sequence")
    assert len(lines) > 1
    assert lines[1].count("\t") == 4  # incl strand column


def test_cli_benchmark(workdir, capsys):
    rc = main(["benchmark", "--hmm", str(workdir / "m.hmm"),
               "--fasta", str(workdir / "db.fasta"), *BASE])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["num_hits"] > 0
    assert set(report["phase_seconds"]) >= {"construction", "data_load",
                                            "sweep", "hit_retrieval"}


def test_cli_validate_and_quantize(workdir, capsys, tmp_path):
    # Build a tblout from a search run's own hits.
    out = workdir / "v.tsv"
    main(["search", "--hmm", str(workdir / "m.hmm"),
          "--fasta", str(workdir / "db.fasta"), *BASE, "--out", str(out)])
    capsys.readouterr()
    rows = []
    for line in out.read_text().splitlines()[1:]:
        seq, pos, model, mp, strand = line.split("\t")
        p = int(pos)
        rows.append(f"{seq} - {model} {model} 1 36 {max(1, p - 9)} {p + 11} "
                    f"{max(1, p - 9)} {p + 11} 2500 + 1e-9 30 0 x")
    tbl = tmp_path / "ref.tbl"
    tbl.write_text("\n".join(rows) + "\n")

    rc = main(["validate", "--hmm", str(workdir / "m.hmm"),
               "--fasta", str(workdir / "db.fasta"), *BASE,
               "--tblout", str(tbl)])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert report["hit_recall"] == 1.0 and report["window_recall"] == 1.0

    rc = main(["quantize", "--hmm", str(workdir / "m.hmm"),
               "--fasta", str(workdir / "db.fasta"), *BASE,
               "--tblout", str(tbl)])
    q = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert q and all("int8_pass_256" in v for v in q.values())


def test_cli_scan(workdir, capsys, tmp_path):
    out = tmp_path / "scan.tsv"
    rc = main(["scan", "--hmm", str(workdir / "m.hmm"),
               str(workdir / "db.fasta"), str(workdir / "db2.fasta"),
               "--backend", "xla", "--pvalue", "0.05", "--out", str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("#file")
    files = {line.split("\t")[0] for line in lines[1:]}
    assert len(files) == 2
