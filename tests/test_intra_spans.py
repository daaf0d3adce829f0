"""Intra-document exact-substring cutting (VERDICT r14 ask #3).

Mirror tests on pathological fixtures: a period-2 repeat (the many-
diagonal case the merged-interval walk must collapse), a disjoint
block repeat, and a cross-doc run sharing the corpus with both — so
the full strip is pinned against hand-computed expectations and the
cross-only strip is pinned UNCHANGED on the same corpus.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from flink_gmall_spark.operators import dedup as D

# doc 1: period-2 pathological repeat — 40 tokens, "pa pb" x 20.
# doc 2: disjoint block repeat — 16-token block, 10 filler, block again.
# doc 3: 30 unique tokens, the first 20 shared with doc 4 (cross-doc).
# doc 4: doc 3's first 20 tokens + a unique 10-token tail.
_D1 = ["pa", "pb"] * 20
_B = [f"b{i}" for i in range(16)]
_D2 = _B + [f"f{i}" for i in range(10)] + _B
_D3 = [f"c{i}" for i in range(30)]
_D4 = _D3[:20] + [f"d{i}" for i in range(10)]

CORPUS = [(i + 1, " ".join(t)) for i, t in enumerate([_D1, _D2, _D3, _D4])]


def _md5(toks):
    return hashlib.md5(" ".join(toks).encode()).hexdigest()


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("intra_sf"))
    spark.createDataFrame(CORPUS, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("t").alias("source"),
        F.length("text").alias("n_chars"),
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_intra_runs_period2_collapse(spark, corpus_dir):
    """A period-2 repeat matches at EVERY even diagonal (2, 4, ... 24
    under the MIN_RUN floor) — the run table is wide but the merged
    cut is one interval: everything past the first period."""
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    runs = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start): r.run_tokens
        for r in D.intra_substring_runs(docs).collect()
        if r.doc_a == 1
    }
    # diag=2m for m=1..12: a_start 0, b_start 2m, run 40-2m >= 16
    assert runs == {(1, 1, 0, 2 * m): 40 - 2 * m for m in range(1, 13)}


def test_intra_ledger_matches_hand_mirror(spark, corpus_dir):
    rows = {r.doc_id: r for r in D.intra_doc_spans(spark, corpus_dir).collect()}
    assert set(rows) == {1, 2}  # docs 3/4 repeat nothing internally
    r1 = rows[1]
    assert (r1.n_spans, r1.dup_tokens, r1.n_tokens) == (1, 38, 40)
    assert r1.intra_coverage_x1000 == (1000 * 38) // 40
    r2 = rows[2]
    assert (r2.n_spans, r2.dup_tokens, r2.n_tokens) == (1, 16, 42)
    assert r2.intra_coverage_x1000 == (1000 * 16) // 42


def test_strip_all_cuts_both_branches(spark, corpus_dir):
    """The full strip cuts intra spans (docs 1-2) AND the cross-doc
    span (doc 4, higher id loses), keeping doc 3 intact — with the
    kept text hash-pinned to the hand-computed survivors."""
    rows = {r.doc_id: r for r in D.strip_all_dup_spans(spark, corpus_dir).collect()}
    assert rows[1].kept_tokens == 2 and rows[1].removed_tokens == 38
    assert rows[1].kept_md5 == _md5(_D1[:2])
    assert rows[2].kept_tokens == 26 and rows[2].removed_tokens == 16
    assert rows[2].kept_md5 == _md5(_D2[:26])
    assert rows[3].kept_tokens == 30 and rows[3].removed_tokens == 0
    assert rows[3].kept_md5 == _md5(_D3)
    assert rows[4].kept_tokens == 10 and rows[4].removed_tokens == 20
    assert rows[4].kept_md5 == _md5(_D4[20:])


def test_cross_only_strip_unchanged_by_intra_branch(spark, corpus_dir):
    """strip_dup_spans (scope='cross', the pre-existing entry) must
    ignore the intra repeats entirely: docs 1-3 keep their full text,
    only doc 4's cross-doc span is cut. Pins that the scope parameter
    default leaves every existing caller's hashes alone."""
    rows = {r.doc_id: r for r in D.strip_dup_spans(spark, corpus_dir).collect()}
    assert rows[1].removed_tokens == 0 and rows[1].kept_md5 == _md5(_D1)
    assert rows[2].removed_tokens == 0 and rows[2].kept_md5 == _md5(_D2)
    assert rows[3].removed_tokens == 0 and rows[3].kept_md5 == _md5(_D3)
    assert rows[4].kept_tokens == 10 and rows[4].kept_md5 == _md5(_D4[20:])


def test_oracles_match_on_fixture(spark, corpus_dir):
    """Run BOTH new oracles in DuckDB over the same fixture parquet and
    compare row-for-row with the Spark side — the driver-contract
    check on the corpus where the intra branch actually fires (the
    synthetic sf tables contain no >=16-token intra repeats, so the
    driver row alone would be a 0-rows-vs-0-rows tautology)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(corpus_dir, 'documents.parquet')}/*.parquet')"
    )
    spark_led = {
        tuple(r) for r in D.intra_doc_spans(spark, corpus_dir).collect()
    }
    duck_led = {tuple(r) for r in con.execute(D.ORACLE_INTRA_DOC_SPANS).fetchall()}
    assert spark_led == duck_led and spark_led
    spark_strip = {
        tuple(r) for r in D.strip_all_dup_spans(spark, corpus_dir).collect()
    }
    duck_strip = {tuple(r) for r in con.execute(D.ORACLE_STRIP_ALL_SPANS).fetchall()}
    assert spark_strip == duck_strip and len(spark_strip) == 4


def test_no_cartesian_in_both_scope(spark, corpus_dir):
    """scope='both' folds the union predicate into ONE gram equi-join:
    the plan has no CartesianProduct/BroadcastNestedLoop, and the gram
    join appears once (the postings are not joined per scope)."""
    plan = D.strip_all_dup_spans(spark, corpus_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
