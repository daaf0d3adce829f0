"""Side-by-side DuckDB-oracle comparison — mirrors the driver's t2 check
(row-count + schema + order-insensitive value hash), but stricter: exact
cell-level equality after canonical ordering."""

from __future__ import annotations

import duckdb
import pandas as pd

from flink_gmall_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: lowercase names, columns sorted by name, numeric
    types widened, rows sorted by the string rendering of every column."""
    out = df.copy()
    out.columns = [c.lower() for c in out.columns]
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(out[c]):
            raise AssertionError(
                f"column {c!r} is a raw timestamp — render to string for parity"
            )
        else:
            out[c] = out[c].astype("string")
    key = out.astype("string").fillna("\x00null")
    order = key.sort_values(by=list(out.columns)).index
    return out.loc[order].reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            g = g.astype("float64")
            w = w.astype("float64")
            bad = ~((g == w) | (g.isna() & w.isna()))
        else:
            g = g.astype("string")
            w = w.astype("string")
            bad = ~((g == w) | (g.isna() & w.isna()))
        if bad.any():
            i = bad.idxmax()
            raise AssertionError(
                f"{name}: column {c!r} differs at row {i}: "
                f"spark={got[c][i]!r} duckdb={want[c][i]!r} "
                f"({int(bad.sum())} mismatched rows)"
            )
