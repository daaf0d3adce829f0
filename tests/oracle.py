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
        # Driver parity: the driver hashes the *rendered* values, so an
        # int column on one side vs float on the other (e.g. DuckDB HUGEINT
        # → pandas float) renders 0 vs 0.0 and hash-mismatches even when
        # numerically equal. Fail here the way the driver would.
        g_int = pd.api.types.is_integer_dtype(g)
        w_int = pd.api.types.is_integer_dtype(w)
        g_flt = pd.api.types.is_float_dtype(g)
        w_flt = pd.api.types.is_float_dtype(w)
        if (g_int and w_flt) or (g_flt and w_int):
            raise AssertionError(
                f"{name}: column {c!r} dtype kind mismatch: "
                f"spark={g.dtype} duckdb={w.dtype} — the driver hashes "
                f"rendered values, so int-vs-float is a hash fail; CAST the "
                f"oracle column (or the Spark column) to align"
            )
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
