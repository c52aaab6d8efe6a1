"""Generate an sf1 fixture (10x sf0.1) under .scale/sf1 for the
one-shot scale probe (VERDICT r5 item 5).

NOT driver data — the driver's fixtures stop at sf0.1; this exists so
the flagship scale claims (kmeans_fit, near_dedup, ssjoin, pagerank,
pq_ann) get one measured 10x datapoint instead of a plan-shape
argument. Deterministic (seed folded into the replica index), written
inside the repo (.scale/ is gitignored), safe to delete after the
probe.

Replication rules:
- lineitem / events: 10 replicas with key-space offsets (disjoint
  orders/users — a bigger world, not 10 exact copies of one).
- documents: replicas mutate ~1/3 of tokens with a replica tag, so
  cross-replica Jaccard ~ 0.5 stays BELOW near-dup thresholds and the
  pair count scales with corpus size instead of exploding
  quadratically inside 10-copy duplicate groups.
- embeddings: replicas get a small deterministic per-dimension offset
  (no exact-duplicate vectors; ANN recall targets stay meaningful).
- dimension tables are copied unchanged.
"""

from __future__ import annotations

import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
REPS = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"set threads to {max(4, os.cpu_count() // 2)}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(sql: str, t: str) -> None:
        out = f"{DST}/{t}.parquet"
        con.execute(
            f"copy ({sql}) to '{out}' (format parquet, row_group_size 262144)"
        )
        n = con.execute(f"select count(*) from read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows")

    write(
        f"""
        select l_orderkey + rep * 10000000 as l_orderkey,
               l_partkey, l_suppkey, l_linenumber,
               l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        from {src('lineitem')}, range({REPS}) t(rep)
        """,
        "lineitem",
    )
    write(
        f"""
        select event_id + rep * 1000000000 as event_id,
               ts, user_id + rep * 1000000 as user_id,
               event_type, value, props
        from {src('events')}, range({REPS}) t(rep)
        """,
        "events",
    )
    write(
        f"""
        select vec_id + rep * 1000000 as vec_id,
               list_transform(embedding, x -> x + rep * 0.001)::FLOAT[]
                   as embedding,
               label
        from {src('embeddings')}, range({REPS}) t(rep)
        """,
        "embeddings",
    )
    # documents: token-level mutation, replica 0 keeps the original text
    write(
        f"""
        select doc_id + rep * 1000000 as doc_id,
               case when rep = 0 then text else
                 list_aggregate(
                   list_transform(
                     list_zip(string_split(text, ' '),
                              range(len(string_split(text, ' ')))),
                     z -> case when (z[2] + rep) % 3 = 0
                          then z[1] || '_r' || rep else z[1] end),
                   'string_agg', ' ')
               end as text,
               lang, source,
               n_chars
        from {src('documents')}, range({REPS}) t(rep)
        """,
        "documents",
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"{t}: copied")
    print("done:", DST)


if __name__ == "__main__":
    main()
