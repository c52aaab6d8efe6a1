"""Interchange formats (sources/formats.py): explicit-schema reads,
null fidelity, corrupt-line quarantine, partitioned layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_k_means_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)


def _sample(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 1.5, True),
            (2, None, None, False),
            (3, "", 0.0, None),
        ],
        "id long, name string, score double, flag boolean",
    )


def _rows(df):
    return sorted(df.collect(), key=lambda r: r["id"])


def test_jsonl_roundtrip_preserves_values_and_nulls(spark, tmp_path):
    df = _sample(spark)
    write_jsonl(df, str(tmp_path / "j"))
    back = read_jsonl(spark, str(tmp_path / "j"), df)
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)


def test_csv_roundtrip_with_null_token(spark, tmp_path):
    """CSV cannot distinguish NULL from '' without a token; with an
    explicit token both survive the trip. (The empty string becomes
    NULL without one — the classic CSV trap.)"""
    df = _sample(spark)
    write_csv(df, str(tmp_path / "c"), null_token="\\N")
    back = read_csv(spark, str(tmp_path / "c"), df, null_token="\\N")
    assert back.schema == df.schema
    got = _rows(back)
    want = _rows(df)
    assert [r["name"] for r in got] == [r["name"] for r in want]
    assert [r["score"] for r in got] == [r["score"] for r in want]


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "name": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "name": "also ok"}\n'
    )
    schema = spark.createDataFrame([], "id long, name string")
    # default: malformed rows dropped, clean schema back
    clean = read_jsonl(spark, str(p), schema)
    assert {r["id"] for r in clean.collect()} == {1, 2}
    # keep_corrupt: quarantined into _corrupt_record
    kept = read_jsonl(spark, str(p), schema, keep_corrupt=True)
    bad = kept.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]


def test_partitioned_jsonl_prunes_on_read(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    )
    write_jsonl(df, str(tmp_path / "p"), partition_by=["part"])
    back = read_jsonl(spark, str(tmp_path / "p"), df)
    sub = back.filter(F.col("part") == 2)
    assert sub.count() == 25
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan


def test_orc_roundtrip_preserves_values_and_nulls(spark, tmp_path):
    from clickhouse_k_means_spark.sources.formats import read_orc, write_orc

    df = _sample(spark)
    write_orc(df, str(tmp_path / "orc"))
    back = read_orc(spark, str(tmp_path / "orc"))
    assert back.schema == df.schema  # footer schema, no inference drift
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_orc_prunes_and_pushes_down(spark, tmp_path):
    from clickhouse_k_means_spark.sources.formats import read_orc, write_orc

    df = spark.range(100).withColumn(
        "part", (F.col("id") % 4).cast("string")
    ).withColumn("v", F.col("id") * 2)
    write_orc(df, str(tmp_path / "p"), partition_by=["part"],
              bloom_filter_cols=["id"])
    back = read_orc(spark, str(tmp_path / "p")).filter(
        (F.col("part") == "2") & (F.col("id") > 50)
    ).select("id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes directories; id predicate reaches the scan
    assert "PartitionFilters: [" in plan and "part" in plan, plan
    assert "PushedFilters: [" in plan and "GreaterThan(id,50)" in plan, plan
    got = sorted(r.id for r in back.collect())
    assert got == [i for i in range(51, 100) if i % 4 == 2]
