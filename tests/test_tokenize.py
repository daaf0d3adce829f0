"""The pinned deterministic tokenizer (F2 — the ik_analyze equivalent).
Golden outputs: dedup/keyword oracles depend on this never changing."""

from __future__ import annotations

from flink_gmall_spark.functions.tokenize import _tokenize_py


def test_ascii_runs():
    assert _tokenize_py("Apple iPhoneXSMax (A2104) 256GB") == [
        "apple",
        "iphonexsmax",
        "a2104",
        "256gb",
    ]


def test_cjk_bigrams_deterministic():
    # the reference's canonical tokenizer probe string is CJK
    # (KeywordUtil.java:36-39); the pinned fallback emits bigrams
    assert _tokenize_py("尚硅谷大数据") == ["尚硅", "硅谷", "谷大", "大数", "数据"]
    assert _tokenize_py("中") == ["中"]


def test_mixed_and_edges():
    assert _tokenize_py("大数据spark课程") == ["大数", "数据", "课程", "spark"]
    assert _tokenize_py("") == []
    assert _tokenize_py(None) == []


# The reference's canonical IK-analyzer probe (KeywordUtil.java:36-39).
# IK smart mode would emit dictionary words (e.g. 深空, 灰色, 手机, 双卡,
# 双待); the pinned jieba-less fallback emits CJK bigrams instead — same
# recall surface for keyword stats, coarser segmentation. Divergence is
# deliberate and documented (tokenize.py module docstring).
_IK_CANONICAL = "Apple iPhoneXSMax (A2104) 256GB 深空灰色 移动联通电信 4G 手机双卡双待 "
_IK_CANONICAL_BIGRAM_GOLDEN = [
    "深空", "空灰", "灰色",
    "移动", "动联", "联通", "通电", "电信",
    "手机", "机双", "双卡", "卡双", "双待",
    "apple", "iphonexsmax", "a2104", "256gb", "4g",
]


def test_ik_canonical_string_fallback_golden():
    import flink_gmall_spark.functions.tokenize as tk

    if tk._HAVE_JIEBA:
        import pytest

        pytest.skip("fallback leg requires jieba-less image")
    assert _tokenize_py(_IK_CANONICAL) == _IK_CANONICAL_BIGRAM_GOLDEN


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
    assert [r.kw for r in rows] == ["手机", "apple", "256gb"]
