"""Empty-input hardening: every operator family must return an EMPTY
(or well-defined) result on 0-row tables, not crash — at 100 TB an
empty partition/day/source is routine (a fresh date partition, a filter
that eliminates everything, a cold-start corpus)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    emb_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame([], doc_schema).write.parquet(
        os.path.join(d, "documents.parquet")
    )
    spark.createDataFrame([], emb_schema).write.parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


DOC_OPS = [
    ("exact_dedup", "dedup"),
    ("minhash_lsh_pairs", "dedup"),
    ("chunk_dedup", "dedup"),
    ("intra_doc_chunk_dedup", "dedup"),
    ("incremental_minhash_dedup", "dedup"),
    ("cluster_representatives", "dedup"),
    ("bpe_train_merges", "curation"),
    ("bpe_encode_corpus", "curation"),
    ("collocations_lift", "curation"),
    ("adaptive_quality_filter", "curation"),
    ("lm_commonness_score", "curation"),
    ("multimodal_dedup_pipeline", "curation"),
    ("weighted_sample", "curation"),
    ("quality_scores", "textstats"),
    ("hashed_classifier_scores", "textstats"),
    ("hll_union_rollup", "textstats"),
    ("containment_prefix_pairs", "dedup"),
    ("minhash_band_tuning", "dedup"),
    ("global_shuffle_shards", "curation"),
    ("padding_waste", "curation"),
    ("chunk_overlap_spec", "curation"),
    ("repeat_epochs_ledger", "curation"),
    # round-10 additions
    ("winnowing_fingerprints", "dedup"),
    ("winnowing_pairs", "dedup"),
    ("winnowing_recall_report", "dedup"),
    ("lsh_recall_report", "dedup"),
    ("token_diversity", "textstats"),
    ("curriculum_stages", "curation"),
    ("preference_pairs", "curation"),
    ("pretrain_build", "curation"),
    # round-11 additions
    ("winnowing_w_sweep", "dedup"),
    ("seq_len_sweep", "curation"),
    ("dsir_weights", "curation"),
    ("importance_resample", "curation"),
    ("bm25_topk", "retrieval"),
    ("bm25_param_sweep", "retrieval"),
    ("query_expansion_prf", "retrieval"),
    ("retrieval_triplets", "retrieval"),
    # round-12 additions
    ("bm25_topk_logidf", "retrieval"),
    ("zipf_slope", "textstats"),
    ("lm_logprob_score", "curation"),
    ("token_entropy", "textstats"),
    # round-12 session 2
    ("phrase_search", "retrieval"),
    # round-13 additions
    ("proximity_topk", "retrieval"),
    ("proximity_unordered_topk", "retrieval"),
    ("sdm_topk", "retrieval"),
    ("exact_substring_runs", "dedup"),
    ("exact_substring_ledger", "dedup"),
    ("substring_coverage_audit", "dedup"),
    ("strip_dup_spans", "dedup"),
    # round-14 additions
    ("unigram_train", "curation"),
    ("unigram_encode_corpus", "curation"),
    ("unigram_fertility_vs_bpe", "curation"),
    ("unigram_token_budget", "curation"),
    ("unigram_vocab_sweep", "curation"),
    ("blocklist_scrub", "curation"),
]

EMB_OPS = [
    ("ann_topk", "ann"),
    ("ivf_topk", "ann"),
    ("kmeans_assign", "ann"),
    ("semantic_dedup", "ann"),
    ("pq_encode", "ann"),
    ("pq_adc_topk", "ann"),
    ("ann_filtered_topk", "ann"),
    ("ivf_filtered_topk", "ann"),
    # round-10 additions
    ("range_search", "ann"),
    ("ivf_range_search", "ann"),
    ("hard_negatives_ivf", "ann"),
    # round-11 additions
    ("ivf_range_search_sampled", "ann"),
    ("hybrid_rrf", "retrieval"),
    # round-12 additions
    ("rrf_k_sweep", "retrieval"),
    ("retrieval_eval", "retrieval"),
    # round-12 session 2 (fuse documents AND embeddings)
    ("rrf_weighted", "retrieval"),
    ("bm25_hard_negatives", "retrieval"),
]


@pytest.mark.parametrize("fn_name,mod", DOC_OPS + EMB_OPS)
def test_operator_survives_empty_tables(spark, empty_dir, fn_name, mod):
    import importlib

    m = importlib.import_module(f"flink_gmall_spark.operators.{mod}")
    df = getattr(m, fn_name)(spark, empty_dir)
    got = df.toPandas()
    # hll rollup legitimately emits its '*ALL*' row (exact_distinct 0);
    # everything else must be empty on empty input
    if fn_name == "hll_union_rollup":
        assert got[got.lang != "*ALL*"].empty
        assert (got[got.lang == "*ALL*"].exact_distinct == 0).all()
        # the absent-sketch guard must keep the bound boolean TRUE (the
        # oracle pins it) — a NULL here is an oracle hash mismatch
        assert got[got.lang == "*ALL*"].hll_ok.all()
    elif fn_name in ("winnowing_recall_report", "lsh_recall_report"):
        # global recall ledgers are ungrouped aggregations: ONE all-zero
        # row on empty input — the same row DuckDB's global agg emits,
        # so the oracle contract holds
        assert len(got) == 1
        assert (got.iloc[0][["true_pairs", "found_pairs", "missed_pairs"]] == 0).all()
    elif fn_name == "winnowing_w_sweep":
        # sweeps report every knob value even on a cold corpus (the
        # literal W dimension) — all counts zero, ratios NULL, exactly
        # the oracle's unconditional per-W rows
        assert len(got) == 4
        assert (got[["n_fps", "n_candidates", "n_true", "n_hit"]] == 0).all().all()
        assert got["recall_x1000"].isna().all()
    elif fn_name == "seq_len_sweep":
        # the one wide aggregate row always exists; stack emits a row
        # per L with docs=0 and NULL sums — same as DuckDB's global agg
        assert len(got) == 4
        assert (got["docs"] == 0).all()
        assert got["util_naive_x1000"].isna().all()
    elif fn_name == "dsir_weights":
        # the weight table covers every bucket by construction; with no
        # evidence both smoothed probabilities equal the floor, so every
        # weight sits at the x1000 parity point
        assert len(got) == 256
        assert (got["raw_ct"] == 0).all() and (got["tgt_ct"] == 0).all()
        assert (got["w_x1000"] == 1000).all()
    elif fn_name == "substring_coverage_audit":
        # ungrouped one-row overlap report, all counters zero (the same
        # row DuckDB's global agg emits on an empty join)
        assert len(got) == 1
        assert (got.iloc[0][[
            "n_docs", "n_docs_with_runs", "n_flagged_ngram",
            "n_flagged_runs", "n_flagged_both", "n_runs_not_ngram",
            "total_dup_tokens",
        ]] == 0).all()
    elif fn_name == "zipf_slope":
        # global fit ledger: ONE row with the 0-slope sentinel (NULL
        # den6 falls to the CASE ELSE in both engines), NULL top_cf
        assert len(got) == 1
        assert got.iloc[0]["n_terms"] == 0
        assert got.iloc[0]["slope_x1e6"] == 0
        assert pd.isna(got.iloc[0]["top_cf"])
    else:
        assert got.empty, got.head()


@pytest.fixture(scope="module")
def empty_tpch_dir(spark, tmp_path_factory):
    """Empty events/orders/lineitem with the REAL fixture schemas (read
    from the driver testdata, so schema drift there propagates here)."""
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = str(tmp_path_factory.mktemp("empty_tpch"))
    for t in ("events", "orders", "lineitem"):
        schema = spark.read.parquet(os.path.join(sf, f"{t}.parquet")).schema
        spark.createDataFrame([], schema).write.parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


ADS_OPS = [
    "part_triangles",
    "part_pagerank_deep",
    "pit_feature_join",
    "rfm_segments_approx",
]


@pytest.mark.parametrize("fn_name", ADS_OPS)
def test_round6_ads_op_survives_empty_tables(spark, empty_tpch_dir, fn_name):
    from flink_gmall_spark.plans import ads

    got = getattr(ads, fn_name)(spark, empty_tpch_dir).toPandas()
    assert got.empty, got.head()
