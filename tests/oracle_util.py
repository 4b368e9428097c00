"""Spark-vs-DuckDB comparison harness mirroring the driver's check:
row count + schema + order-insensitive value hash (columns sorted by name,
floats rounded to 4 decimals, NULL as literal)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from fifteenmc_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        r = round(v, 4)
        if r == int(r):
            return str(int(r))
        return f"{r:.4f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spdf) == len(oracle_pdf), f"{name}: rowcount spark={len(spdf)} oracle={len(oracle_pdf)}"
    a, b = canonical_rows(spdf), canonical_rows(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
