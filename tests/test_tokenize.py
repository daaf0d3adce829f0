"""The pinned deterministic tokenizer (F2 — the ik_analyze equivalent).
Golden outputs: dedup/keyword oracles depend on this never changing."""

from __future__ import annotations

from flink_gmall_spark.functions.tokenize import _fmm_segment, _tokenize_py


def test_ascii_runs():
    assert _tokenize_py("Apple iPhoneXSMax (A2104) 256GB") == [
        "apple",
        "iphonexsmax",
        "a2104",
        "256gb",
    ]


def test_cjk_fmm_deterministic():
    # the reference's canonical tokenizer probe string is CJK
    # (KeywordUtil.java:36-39); the jieba-less leg segments via forward
    # maximum matching over the seed lexicon
    assert _tokenize_py("尚硅谷大数据") == ["尚硅谷", "大数据"]
    assert _tokenize_py("中") == ["中"]


def test_mixed_and_edges():
    # tokens come out in TEXT ORDER (CJK and alnum runs interleaved)
    assert _tokenize_py("大数据spark课程") == ["大数据", "spark", "课程"]
    assert _tokenize_py("") == []
    assert _tokenize_py(None) == []


def test_fmm_oov_bigram_backoff():
    # an all-OOV CJK run backs off to bigrams (joinable keywords, not a
    # char soup); a single OOV char passes through
    assert _fmm_segment("魔法石头记") == ["魔法", "法石", "石头", "头记"]
    assert _fmm_segment("魔") == ["魔"]
    # OOV chars between dictionary words flush as their own unit
    assert _fmm_segment("手机魔大数据") == ["手机", "魔", "大数据"]


# The reference's canonical IK-analyzer probe (KeywordUtil.java:36-39).
# The jieba-less FMM leg reproduces IK smart mode's stream on this vector:
# dictionary words in text order, alnum runs lowercased in place.
_IK_CANONICAL = "Apple iPhoneXSMax (A2104) 256GB 深空灰色 移动联通电信 4G 手机双卡双待 "
_IK_CANONICAL_GOLDEN = [
    "apple", "iphonexsmax", "a2104", "256gb",
    "深空", "灰色",
    "移动", "联通", "电信",
    "4g",
    "手机", "双卡", "双待",
]


def test_ik_canonical_string_fallback_golden():
    import flink_gmall_spark.functions.tokenize as tk

    if tk._HAVE_JIEBA:
        import pytest

        pytest.skip("fallback leg requires jieba-less image")
    assert _tokenize_py(_IK_CANONICAL) == _IK_CANONICAL_GOLDEN


def test_ik_canonical_string_jieba():
    """Gate-flips on when jieba appears in the image (like protobuf for
    transformWithState): IK-analog segmentation must be deterministic,
    cover the whole string, and find the dictionary words IK finds."""
    import flink_gmall_spark.functions.tokenize as tk

    if not tk._HAVE_JIEBA:
        import pytest

        pytest.skip("jieba not installed in this image")
    toks = _tokenize_py(_IK_CANONICAL)
    assert toks == _tokenize_py(_IK_CANONICAL)  # deterministic
    assert "手机" in toks
    assert all(t in _IK_CANONICAL or t in _IK_CANONICAL.lower() for t in toks)


def test_sql_registration(spark):
    from flink_gmall_spark.functions.tokenize import register_sql_udfs

    register_sql_udfs(spark)
    rows = spark.sql(
        "SELECT explode(ik_analyze('Apple 手机 256GB')) AS kw"
    ).collect()
    assert [r.kw for r in rows] == ["apple", "手机", "256gb"]
