"""Edge-semantics tests for the round-5 operators: the adaptive quality
filter's boundary-group arithmetic and the BPE trainer's greedy merge,
both on hand-built corpora with hand-computed expectations."""

from __future__ import annotations

import os

import pandas as pd
import pytest


@pytest.fixture()
def tiny_docs_dir(spark, tmp_path):
    """A documents table crafted so one language has score TIES straddling
    the 70% boundary: lang 'aa' has 10 docs, 7 kept; docs 0-4 score high,
    docs 5-9 all share ONE lower score, so exactly 2 of them (smallest
    doc_ids: 5, 6) must be kept by the boundary-group rank."""
    rows = []
    # 5 clearly-high docs: all stopwords -> score 1000
    for i in range(5):
        rows.append((i, "the a and of", "aa", "s", 12))
    # 5 tied low docs: 1 stopword of 4 tokens -> score 250
    for i in range(5, 10):
        rows.append((i, "the xx yy zz", "aa", "s", 12))
    # a second language with 3 docs (quota = 2): distinct scores, no tie
    rows.append((100, "the of and", "bb", "s", 10))      # 1000
    rows.append((101, "the xx", "bb", "s", 6))           # 500
    rows.append((102, "xx yy", "bb", "s", 5))            # 0
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "tiny")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_adaptive_quality_boundary_group_take(spark, tiny_docs_dir):
    from flink_gmall_spark.operators import curation

    got = (
        curation.adaptive_quality_filter(spark, tiny_docs_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # lang aa: quota = 7 -> docs 0-4 (score 1000) + docs 5,6 (the two
    # smallest ids at the tied boundary score); docs 7-9 dropped.
    # lang bb: quota = 2 -> docs 100, 101.
    assert got["doc_id"].tolist() == [0, 1, 2, 3, 4, 5, 6, 100, 101]
    aa = got[got["lang"] == "aa"]
    assert (aa[aa["doc_id"] >= 5]["score"] == 250).all()


def test_bpe_trainer_hand_computed_merges(spark, tmp_path):
    """Corpus 'aaab' x3 + 'ab' x2 (as distinct docs): dictionary
    {aaab: 3, ab: 2}. Round 1 pairs: (a a): 2*3=6, (a b): 3+2=5 ->
    merge 'a a'. Round 2 words {['aa','a','b']x3, ['a','b']x2}: pairs
    (aa a)=3, (a b)=5 -> wait (a b) appears in 'aa a b' (a,b adjacent)
    AND 'a b' -> 3+2=5 beats (aa a)=3 -> merge 'a b'."""
    from flink_gmall_spark.operators import curation

    rows = [(i, "aaab", "aa", "s", 4) for i in range(3)]
    rows += [(10 + i, "ab", "aa", "s", 2) for i in range(2)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "bpe")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = (
        curation.bpe_train_merges(spark, d)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # dictionary is DISTINCT words: {aaab: 3, ab: 2}
    assert got.loc[0, "pair"] == "a a" and got.loc[0, "ct"] == 6
    assert got.loc[1, "pair"] == "a b" and got.loc[1, "ct"] == 5
