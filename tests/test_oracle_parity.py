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


@pytest.mark.parametrize("key", SQL_KEYS)
def test_oracle_parity(key, spark, sf_dir):
    assert key in QUERIES, f"oracle_sql has {key} but queries() does not"
    got = _canon(QUERIES[key](spark, sf_dir).toPandas())
    con = _duck(sf_dir)
    want = _canon(con.execute(ORACLES[key]).df())
    con.close()
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


def test_driver_window_pins_r7_rotation():
    """Rotation contract (VERDICT r5 item 2, advanced per r6 item 2):
    the driver records rows for the FIRST 50 registry entries only.
    r7 window = 6-query fixed head + the cohort that had never had a
    driver row (VERDICT r6 Missing #2: the 45 r6 additions minus the 6
    that overflow into r8) + the group-B leftovers. Every windowed
    entry must have an oracle twin so its driver row is a full
    value-hash gate; the overflow + this round's single addition
    (multimodal_codec_stats, the real-codec gate) must all sit inside
    the r8 slice so the never-gated debt hits 0 next round (r6
    item 3's schedule)."""
    keys = list(QUERIES)
    window = keys[:50]
    head = {
        "yh_contract", "nearest_assign", "lloyd_recompute", "kmeanspp_pick",
        "elbow_total", "kmeans_fit_history",
    }
    assert head <= set(window), sorted(head - set(window))
    first_gates_r7 = {
        "tpch_q7", "tpch_q10", "tpch_q14", "tpch_q19", "tpch_q2a",
        "running_diff", "sequence_match", "window_funnel", "entropy",
        "chi_square", "tpch_q6", "tpch_q8a", "tpch_q12a", "tpch_q15",
        "tpch_q17", "tpch_q22a", "topk_heavy", "topk_weighted",
        "ema_decay", "lttb", "array_funcs", "map_agg",
        "audience_overlap", "rollup_incremental", "sequence_count",
        "rolling_median", "stateful_stats", "regex_extract",
        "pipeline_e2e", "knn_join", "grid_dbscan", "bisect_kmeans",
        "lateral_topn", "grouping_sets", "recursive_cte",
        "variant_json", "pyds_read", "ngram_sim", "locf_fill",
        # group-B leftovers whose last green driver row was r4
        "mllib_kmeans", "lang_id", "quality_scores", "token_counts",
        "doc_fingerprint",
    }
    assert first_gates_r7 <= set(window), sorted(first_gates_r7 - set(window))
    assert all(k in ORACLES for k in window)
    # after r7 the entire remaining never-gated debt must sit inside
    # the r8 slice (positions 50..93) so it clears next round
    pending_r8 = {
        "multimodal_codec_stats", "interval_union", "stream_join",
        "array_set_ops", "triangles", "weighted_quantiles",
        "anomaly_zscore",
        # r7 addition, appended behind the pending cohort (r6 item 3)
        "semdedup",
    }
    r8_slice = set(keys[50:94])
    assert pending_r8 <= r8_slice, sorted(pending_r8 - r8_slice)
    # the cadence must close: ceil(rotating / slots) rounds per full
    # sweep, with slots = 50 - len(fixed head). The registry comment
    # documents the CURRENT ceil — keep them in sync (VERDICT r5
    # item 2: never promise a cadence the arithmetic can't meet).
    rotating = len(keys) - len(head)
    slots = 50 - len(head)
    assert -(-rotating // slots) <= 4
