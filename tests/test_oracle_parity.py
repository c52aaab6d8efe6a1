"""Driver-style oracle parity: run every ``queries()`` entry on Spark
and its ``oracle_sql()`` twin on DuckDB over the same parquet fixtures,
then compare row count, column set, and exact values (order-insensitive)
— the same gate CORRECTNESS_r{N}.json applies at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from clickhouse_k_means_spark.sources.dataset import TABLES

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()
SQL_KEYS = sorted(ORACLES)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLES))


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _dtype_class(dtype) -> str:
    """Coarse dtype class used by the pre-coercion parity assert:
    the driver's value hash is dtype-sensitive, so an oracle column
    that comes back float64 (e.g. DuckDB HUGEINT via pandas) must NOT
    be silently coerced to match an int64 Spark column — that exact
    blind spot shipped the r5 range_frame and r7 q14/q8a reds
    (VERDICT r7 item 2)."""
    s = str(dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    if s.startswith("datetime"):
        return "datetime"
    return "object"


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif str(out[c].dtype).startswith(("int", "uint", "Int")):
            out[c] = out[c].astype("int64")
        elif str(out[c].dtype).startswith("float"):
            out[c] = out[c].astype("float64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def _assert_dtype_classes_match(key: str, got: pd.DataFrame, want: pd.DataFrame):
    """Compare dtype CLASSES on the raw (pre-_canon) frames."""
    gc = {c: _dtype_class(got[c].dtype) for c in got.columns}
    wc = {c: _dtype_class(want[c].dtype) for c in want.columns}
    bad = {
        c: (gc[c], wc.get(c))
        for c in gc
        if c in wc and gc[c] != wc[c]
    }
    assert not bad, (
        f"{key}: dtype-class mismatch (spark vs oracle) {bad} — the "
        "driver hash is dtype-sensitive; cast the oracle column "
        "(::BIGINT for DuckDB HUGEINT sums/ratios) instead of relying "
        "on _canon coercion"
    )


@pytest.mark.parametrize("key", SQL_KEYS)
def test_oracle_parity(key, spark, sf_dir):
    assert key in QUERIES, f"oracle_sql has {key} but queries() does not"
    got_raw = QUERIES[key](spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    want_raw = con.execute(ORACLES[key]).df()
    con.close()
    _assert_dtype_classes_match(key, got_raw, want_raw)
    got = _canon(got_raw)
    want = _canon(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"{key}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{key}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        if got[c].dtype == "float64":
            ga, wa = got[c].to_numpy(), want[c].to_numpy()
            both_nan = pd.isna(ga) & pd.isna(wa)
            close = [
                bool(bn) or (gv == wv or math.isclose(gv, wv, rel_tol=0, abs_tol=0))
                for gv, wv, bn in zip(ga, wa, both_nan)
            ]
            bad = [i for i, ok in enumerate(close) if not ok]
            assert not bad, (
                f"{key}.{c}: {len(bad)} mismatches, first at row {bad[0]}: "
                f"{ga[bad[0]]!r} != {wa[bad[0]]!r}"
            )
        else:
            same = got[c].eq(want[c]) | (got[c].isna() & want[c].isna())
            bad = got.index[~same].tolist()
            assert not bad, (
                f"{key}.{c}: {len(bad)} mismatches, first at row {bad[0]}: "
                f"{got[c][bad[0]]!r} != {want[c][bad[0]]!r}"
            )


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS or ["__all_have_oracles__"])
def test_rows_only_queries_run(key, spark, sf_dir):
    if key == "__all_have_oracles__":
        # an empty parametrize list renders as a SKIP marker; assert
        # the actual (good) state instead: every registry entry has a
        # full-value oracle twin, nothing is rows-only
        assert not ROWS_ONLY_KEYS
        return
    df = QUERIES[key](spark, sf_dir)
    # the driver gate canonicalizes (sorts) EVERY query's output, even
    # rows-only ones — unhashable cells (arrays/maps) err the gate row
    # (CORRECTNESS_r01), so run the same canonicalization here
    pdf = _canon(df.toPandas())
    assert len(pdf) >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {f.name for f in df.schema} == {"j", "n", "avg_dist"}


def test_driver_window_pins_r14_rotation():
    """Rotation contract (VERDICT r5 item 2): the driver records rows
    for the FIRST 50 registry entries only. r14 window = 6-query fixed
    head + the next 44 rotation slots exactly as the r13 comment
    scheduled (VERDICT r13 item 3 — "hold the rotation"): the five
    r13 additions taking their FIRST driver rows (ann_filtered_query,
    stream_upsert_ingest, ann_compaction, ann_recall,
    hybrid_filtered_retrieval), then the pointer's continuation: the
    r9-window remainder (bigram_lm .. tpch_q16) and the first 32 of
    the r10-window cohort (cdc_dedup .. decontaminate) — the circular
    pointer back around. New r14 queries sit at position 50+ so they
    first-gate at the front of the r15 window; the gated r13-window
    cohort (stream_ivfpq_ingest .. inverted_index) rotated to the
    back."""
    keys = list(QUERIES)
    window = keys[:50]
    head = {
        "yh_contract", "nearest_assign", "lloyd_recompute", "kmeanspp_pick",
        "elbow_total", "kmeans_fit_history",
    }
    assert head <= set(window), sorted(head - set(window))
    # VERDICT r13 item 3: the five r13 additions open the rotation
    # part of the window, in the scheduled order
    assert keys[6:11] == [
        "ann_filtered_query", "stream_upsert_ingest", "ann_compaction",
        "ann_recall", "hybrid_filtered_retrieval",
    ]
    # the pointer's natural continuation fills the rest of the window:
    # r9-window remainder, then the r10 cohort coming back around
    assert keys[11] == "bigram_lm"
    assert keys[18] == "cdc_dedup"
    assert keys[49] == "decontaminate"
    assert all(k in ORACLES for k in window)
    # the gated r13-window cohort sits at the BACK of the rotation
    assert keys[-44] == "stream_ivfpq_ingest" and keys[-1] == "inverted_index"
    # the cadence must close: ceil(rotating / slots) rounds per full
    # sweep, with slots = 50 - len(fixed head). The registry comment
    # documents the CURRENT ceil — keep them in sync (VERDICT r5
    # item 2: never promise a cadence the arithmetic can't meet).
    # VERDICT r10 item 6: the r11 additions push ceil(rotating/slots)
    # from the exactly-saturated 4 (176/44) to 5 — the honest cadence
    # is now 5 rounds per full driver sweep; between driver rows every
    # entry is still certified EVERY round by this module's
    # registry-wide oracle-parity sweep (the identical three-way
    # rows/schema/hash comparison).
    rotating = len(keys) - len(head)
    slots = 50 - len(head)
    assert -(-rotating // slots) <= 5


def test_uncast_hugeint_oracle_column_fails_dtype_gate():
    """VERDICT r7 item 2 'Done =' probe: a DuckDB HUGEINT column left
    uncast arrives in pandas as float64; against an int64 Spark column
    the dtype-class gate must FAIL (the driver hash would). This is
    exactly the q14/q8a shape that shipped red in r7."""
    con = duckdb.connect()
    # sum(BIGINT) in DuckDB is HUGEINT; // keeps HUGEINT
    want_raw = con.execute(
        "select (sum(x) * 1000000) // sum(y) as ppm "
        "from (values (1::BIGINT, 3::BIGINT), (2, 4)) t(x, y)"
    ).df()
    con.close()
    got_raw = pd.DataFrame({"ppm": pd.Series([428571], dtype="int64")})
    assert _dtype_class(want_raw["ppm"].dtype) == "float", (
        "probe premise: uncast HUGEINT must land as float64 in pandas"
    )
    with pytest.raises(AssertionError, match="dtype-class mismatch"):
        _assert_dtype_classes_match("probe", got_raw, want_raw)
    # and the cast form passes
    con = duckdb.connect()
    cast_raw = con.execute(
        "select ((sum(x) * 1000000) // sum(y))::BIGINT as ppm "
        "from (values (1::BIGINT, 3::BIGINT), (2, 4)) t(x, y)"
    ).df()
    con.close()
    _assert_dtype_classes_match("probe_cast", got_raw, cast_raw)
