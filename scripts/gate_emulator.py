"""Driver-gate emulator: run every ``queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 in registration order, timing
each, and report mismatches — a local stand-in for CORRECTNESS_r{N}.json
so driver truncation/timeout behavior is diagnosable before the round
ends.

Usage: python scripts/gate_emulator.py [key ...]   (default: all keys)
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from clickhouse_k_means_spark.session import get_spark
from clickhouse_k_means_spark.sources.dataset import TABLES

SF_DIR = "/root/testdata/sf0.01"


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


def _vhash(pdf: pd.DataFrame) -> str:
    h = hashlib.md5()
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype == "float64":
            col = col.map(lambda v: f"{v:.9g}" if pd.notna(v) else "NaN")
        h.update(col.astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()


def main() -> None:
    keys = sys.argv[1:]
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if not keys:
        keys = list(queries)
    spark = get_spark("gate-emulator")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    t_all = time.time()
    results: dict[str, dict] = {}
    for key in keys:
        t0 = time.time()
        row: dict = {}
        try:
            got = _canon(queries[key](spark, SF_DIR).toPandas())
            t_spark = time.time() - t0
            row["spark_rows"] = len(got)
            row["spark_s"] = round(t_spark, 2)
            if key in oracles:
                t1 = time.time()
                want = _canon(con.execute(oracles[key]).df())
                row["oracle_s"] = round(time.time() - t1, 2)
                row["rows_match"] = len(got) == len(want)
                row["schema_match"] = list(got.columns) == list(want.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and _vhash(got) == _vhash(want)
                )
            else:
                row["no_oracle"] = True
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:300]
        row["total_s"] = round(time.time() - t0, 2)
        results[key] = row
        ok = row.get("hash_match", row.get("spark_rows") is not None)
        flag = "OK " if ok and "err" not in row else "BAD"
        print(f"{flag} {key:24s} {row.get('total_s', 0):7.2f}s  {row}", flush=True)
    print(f"\nTOTAL {time.time() - t_all:.1f}s over {len(keys)} queries")
    bad = {
        k: v
        for k, v in results.items()
        if v.get("err") or v.get("hash_match") is False
    }
    if bad:
        print("FAILURES:\n" + json.dumps(bad, indent=2))
        sys.exit(1)


if __name__ == "__main__":
    main()
