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


def test_sql_registration(spark):
    from flink_gmall_spark.functions.tokenize import register_sql_udfs

    register_sql_udfs(spark)
    rows = spark.sql(
        "SELECT explode(ik_analyze('Apple 手机 256GB')) AS kw"
    ).collect()
    assert [r.kw for r in rows] == ["手机", "apple", "256gb"]
