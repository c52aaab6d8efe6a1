"""CLI driver tests — the reference k-means.sh workflow end-to-end."""

from __future__ import annotations

import json
import os

from clickhouse_k_means_spark.cli import main


def test_cli_generate_and_export(tmp_path, capsys, spark):
    out = str(tmp_path / "pivot")
    hist = str(tmp_path / "wcr")
    rc = main(
        [
            "--generate",
            "--k",
            "4",
            "--seed",
            "42",
            "--out",
            out,
            "--history",
            hist,
            "--quiet",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["converged"] and len(summary["centroids"]) == 4
    # pivot TSV: header + one series column per cluster (S7/P7)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    header = open(os.path.join(out, files[0])).readline().strip().split("\t")
    assert header == ["x", "p1", "p2", "p3", "p4"]
    # WCR history parquet
    wcr = spark.read.parquet(hist)
    assert {f.name for f in wcr.schema} == {"step", "j", "C"}
    assert wcr.filter("step = 0").count() == 4


def test_cli_parquet_input(tmp_path, capsys, sf_dir):
    rc = main(
        [
            "--input",
            f"{sf_dir}/lineitem.parquet",
            "--key",
            "l_orderkey",
            "--features",
            "l_quantity,l_discount",
            "--k",
            "3",
            "--max-iter",
            "12",
            "--quiet",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(summary["centroids"]) == 3


def test_cli_input_requires_key_features(capsys):
    assert main(["--input", "x.parquet"]) == 2
