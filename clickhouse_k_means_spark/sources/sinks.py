"""Sinks — the reference's TSV export surface.

Reference (k-means.sh:3-5,45): ``clickhouse-client -f TSVWithNames
--format_tsv_null_representation ' '`` piped to the clipboard. Spark
mapping: the CSV writer with tab separator, header, and the custom NULL
token (SURVEY S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv(df: DataFrame, path: str, null_token: str = " ") -> None:
    """Write ``df`` as TSV-with-names, NULLs rendered as ``null_token``."""
    (
        df.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .option("nullValue", null_token)
        .option("emptyValue", '""')
        .csv(path)
    )


def to_tsv_string(df: DataFrame, null_token: str = " ") -> str:
    """Small-result convenience: TSVWithNames as a string (driver-side).

    DRIVER-SIZED CONTRACT: this collects the whole result to the
    driver (``toPandas``). It exists for the reference's
    pipe-to-clipboard export (k-means.sh:45 — S7/B5), where results
    are k-row model tables. Never point it at a corpus-scale
    DataFrame; the distributed scale path is ``write_tsv`` above.
    """
    pdf = df.toPandas()
    return pdf.to_csv(sep="\t", index=False, na_rep=null_token)
