"""Tokenizer surface — the engine's UDTF-equivalent (SURVEY §2.3 F2).

The reference's only UDF is the ``ik_analyze`` Chinese-segmentation
TableFunction (gmall KeywordUDTF.java:14-24, KeywordUtil.java:16-34) used as
``LATERAL TABLE(ik_analyze(fullword))``. Spark-first equivalents, fastest
first:

1. ``tokens_col`` — pure JVM ``split`` + ``filter`` higher-order function.
   This is the hot path used by keyword stats / dedup / text analysis; it
   stays inside whole-stage codegen and has an exact DuckDB counterpart
   (``list_filter(string_split_regex(lower(text), re), x -> x <> '')``).
2. ``tokenize_udf`` — an array-returning Python UDF (the UDTF idiom:
   ``explode(tokenize(col))``), registered for SQL as ``ik_analyze``.
   Uses jieba when importable (the reference's IK smart mode analog),
   else a deterministic fallback: CJK bigrams + lowercased alnum runs.
   The fallback is pinned — golden tests rely on it.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: split regex shared verbatim with every DuckDB oracle.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

_ALNUM_RUN = re.compile(r"[a-z0-9]+")
_CJK = re.compile(r"[一-鿿]")

try:  # pragma: no cover - jieba is not in the test image
    import jieba  # type: ignore

    _HAVE_JIEBA = True
except Exception:  # pragma: no cover
    jieba = None
    _HAVE_JIEBA = False


def tokens_col(text_col: str | Column) -> Column:
    """Lowercased alnum-run tokens as an array column — JVM-side, codegen'd.

    DuckDB oracle: ``list_filter(string_split_regex(lower(x), '[^a-z0-9]+'),
    t -> t <> '')``.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def _tokenize_py(text: str | None) -> list[str]:
    """Deterministic Python tokenizer (the ik_analyze stand-in)."""
    if not text:
        return []
    if _HAVE_JIEBA and _CJK.search(text):  # pragma: no cover
        return [t for t in jieba.lcut_for_search(text) if t.strip()]
    out: list[str] = []
    # CJK bigrams (IK-like smart segmentation fallback, pinned)
    cjk_runs = re.findall(r"[一-鿿]+", text)
    for run in cjk_runs:
        if len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i : i + 2] for i in range(len(run) - 1))
    out.extend(_ALNUM_RUN.findall(text.lower()))
    return out


tokenize_udf = F.udf(_tokenize_py, T.ArrayType(T.StringType()))


def register_sql_udfs(spark: SparkSession) -> None:
    """Expose the tokenizer to spark.sql() as ``ik_analyze`` — the
    reference registers it the same way (KeywordStatsApp.java:40)."""
    spark.udf.register("ik_analyze", _tokenize_py, T.ArrayType(T.StringType()))
