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
   else a deterministic forward-maximum-matching (FMM) segmenter over a
   seed lexicon — the same dictionary-matching family IK itself belongs
   to — with single-char emission for out-of-vocabulary CJK and bigram
   backoff for OOV runs of length >= 2 (so unknown phrases still produce
   joinable keywords instead of a char soup). Tokens are emitted in TEXT
   ORDER (CJK and alnum runs interleaved), matching IK's stream order on
   the reference's canonical probe (KeywordUtil.java:36-39). The fallback
   is pinned — golden tests rely on it; the lexicon extends by appending
   (never reordering) _SEED_LEXICON.
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


#: Seed lexicon for the jieba-less FMM leg. Common-word entries chosen to
#: cover the reference's canonical IK probe (KeywordUtil.java:36-39) and
#: its e-commerce/keyword domain; extend by APPENDING (golden tests pin
#: current behavior). Longest-match-first is implicit in FMM.
_SEED_LEXICON = frozenset(
    {
        # canonical probe vocabulary (product-title domain)
        "深空", "灰色", "移动", "联通", "电信", "手机", "双卡", "双待",
        # gmall / big-data domain
        "尚硅谷", "大数据", "数据", "实时", "数仓", "项目", "课程",
        "电商", "用户", "订单", "支付", "商品", "关键词", "统计",
    }
)
_LEXICON_MAX_LEN = max(len(w) for w in _SEED_LEXICON)


def _fmm_segment(run: str, lexicon: frozenset[str] | None = None) -> list[str]:
    """Forward maximum matching over the lexicon (default _SEED_LEXICON):
    at each position take the longest dictionary word; OOV chars
    accumulate and back off to bigrams (len>=2) or a single char —
    deterministic, order-preserving. The ``lexicon`` parameter exists for
    the append-only property tests (tests/test_tokenize.py), which pin
    that growing the dictionary never disturbs golden segmentations."""
    if lexicon is None:
        lexicon = _SEED_LEXICON
        max_len = _LEXICON_MAX_LEN
    else:
        max_len = max((len(w) for w in lexicon), default=1)
    out: list[str] = []
    oov: list[str] = []

    def flush() -> None:
        if not oov:
            return
        run_oov = "".join(oov)
        if len(run_oov) == 1:
            out.append(run_oov)
        else:
            out.extend(run_oov[i : i + 2] for i in range(len(run_oov) - 1))
        oov.clear()

    i = 0
    while i < len(run):
        for w in range(min(max_len, len(run) - i), 1, -1):
            if run[i : i + w] in lexicon:
                flush()
                out.append(run[i : i + w])
                i += w
                break
        else:
            oov.append(run[i])
            i += 1
    flush()
    return out


_RUNS = re.compile(r"[一-鿿]+|[a-z0-9]+")


def _tokenize_py(text: str | None) -> list[str]:
    """Deterministic Python tokenizer (the ik_analyze stand-in)."""
    if not text:
        return []
    if _HAVE_JIEBA and _CJK.search(text):  # pragma: no cover
        return [t for t in jieba.lcut_for_search(text) if t.strip()]
    out: list[str] = []
    for run in _RUNS.findall(text.lower()):
        if _CJK.search(run):
            out.extend(_fmm_segment(run))
        else:
            out.append(run)
    return out


tokenize_udf = F.udf(_tokenize_py, T.ArrayType(T.StringType()))


def register_sql_udfs(spark: SparkSession) -> None:
    """Expose the tokenizer to spark.sql() as ``ik_analyze`` — the
    reference registers it the same way (KeywordStatsApp.java:40)."""
    spark.udf.register("ik_analyze", _tokenize_py, T.ArrayType(T.StringType()))


def register_keyword_udtf(spark: SparkSession) -> None:
    """Register the tokenizer as a true Python TABLE function
    (``LATERAL ik_analyze_t(text)``) — the third leg of the §2.10 UDF
    surface and the literal shape of the reference's KeywordUDTF
    (``LATERAL TABLE(ik_analyze(fullword))``, KeywordStatsApp.java:40-53):
    one output ROW per keyword, not an array to explode.

    Slow-path by design (per-row Python, like the scalar ``ik_analyze``);
    hot paths keep using ``tokens_col``. Defined lazily so importing this
    module never requires the UDTF machinery."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="keyword: string")
    class IkAnalyzeTable:
        def eval(self, text: str):  # noqa: ANN001 - Spark UDTF contract
            for t in _tokenize_py(text):
                yield (t,)

    spark.udtf.register("ik_analyze_t", IkAnalyzeTable)

    # The ORACLE-PAIRED table function: pure regex tokenization, exactly
    # tokens_col / string_split_regex semantics, so LATERAL queries over
    # it hash-match the DuckDB oracles on ANY corpus. ik_analyze_t above
    # keeps the CJK-faithful segmentation (jieba/FMM) — golden-pinned in
    # tests, but NOT oracle-expressible (the regex oracle drops CJK runs)
    # and jieba-availability-dependent, so registry entries must use
    # tokens_t. (Divergence caught by review.)
    @udtf(returnType="keyword: string")
    class TokensTable:
        def eval(self, text: str):  # noqa: ANN001 - Spark UDTF contract
            if text:
                for t in _ALNUM_RUN.findall(text.lower()):
                    yield (t,)

    spark.udtf.register("tokens_t", TokensTable)
