"""Edge-semantics tests for the round-5b operators (PQ encode/ADC,
intra-doc chunk dedup, incremental minhash dedup, collocation lift, HLL
union rollup) on hand-built corpora with hand-computed expectations."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T


def _write_docs(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def _write_embeddings(spark, tmp_path, vecs):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    rows = [(int(i), [float(x) for x in v], 0) for i, v in vecs]
    d = str(tmp_path / "emb")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


@pytest.fixture()
def pq_dir(spark, tmp_path):
    """20 vectors of dim 64. Codewords are vec_id < 16 (well-separated:
    vec j = constant j*10 across all dims). Probes:
    - vec 16 = exact copy of codeword 3 -> codes [3,3,3,3], sdist 0;
    - vec 17 = codeword 5 except subspace 2 (dims 32-47) copied from
      codeword 7 -> codes [5,5,7,5];
    - vec 18 = exact copy of codeword 2 (query 2's duplicate for ADC);
    - vec 19 = codeword 9 shifted by +1 in every dim -> codes all 9,
      per-subspace sdist = 16 * 1.0."""
    base = {j: [j * 10.0] * 64 for j in range(16)}
    v17 = list(base[5])
    v17[32:48] = base[7][32:48]
    v19 = [x + 1.0 for x in base[9]]
    vecs = [(j, base[j]) for j in range(16)] + [
        (16, base[3]),
        (17, v17),
        (18, base[2]),
        (19, v19),
    ]
    return _write_embeddings(spark, tmp_path, vecs)


def test_pq_encode_hand_codes(spark, pq_dir):
    from flink_gmall_spark.operators import ann

    got = ann.pq_encode(spark, pq_dir).toPandas()
    codes = {
        vid: [int(r.code) for r in g.sort_values("sub_id").itertuples()]
        for vid, g in got.groupby("vec_id")
    }
    assert codes[16] == [3, 3, 3, 3]
    assert codes[17] == [5, 5, 7, 5]
    assert codes[18] == [2, 2, 2, 2]
    assert codes[19] == [9, 9, 9, 9]
    s16 = got[got.vec_id == 16].sdist
    assert (s16 == 0.0).all()
    s19 = got[got.vec_id == 19].sdist
    assert (s19 == 16.0).all()  # 16 dims x (+1)^2 per subspace


def test_pq_adc_duplicate_is_nearest(spark, pq_dir):
    """Query 2's exact duplicate (vec 18) shares its codes, so its ADC
    distance equals the sum of query 2's own quantization errors — zero
    here — and it must rank 1."""
    from flink_gmall_spark.operators import ann

    got = ann.pq_adc_topk(spark, pq_dir).toPandas()
    top = got[(got.query_id == 2) & (got["rank"] == 1)].iloc[0]
    assert int(top.neighbor_id) == 18
    assert top.adist == 0.0


def test_intra_doc_chunk_dedup_repeats_collapse(spark, tmp_path):
    """'a b c' repeated 3x collapses to one chunk; a trailing partial
    chunk is its own unit and survives."""
    from flink_gmall_spark.operators import dedup

    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c a b c a b c", "en", "s", 17),
            (2, "a b c a b c x y", "en", "s", 15),  # chunks: 'a b c' x2, 'x y'
        ],
    )
    got = dedup.intra_doc_chunk_dedup(spark, d).toPandas().set_index("doc_id")
    assert got.loc[1, "n_chunks"] == 3 and got.loc[1, "kept_chunks"] == 1
    assert got.loc[1, "dedup_text"] == "a b c"
    assert got.loc[2, "n_chunks"] == 3 and got.loc[2, "kept_chunks"] == 2
    assert got.loc[2, "dedup_text"] == "a b c x y"


def test_incremental_minhash_kills_only_cross_batch_dups(spark, tmp_path):
    """New batch = doc_id % 4 == 0. Doc 4 duplicates corpus doc 1 ->
    flagged with dup_of=1. Doc 0 and 8 are unique -> survive with no
    match. Docs 0 and 4 do NOT match each other even if similar (both
    new: within-batch pairs are out of scope for the incremental pass)."""
    from flink_gmall_spark.operators import dedup

    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, boiler, "en", "s", len(boiler)),
            (2, "totally different corpus text one two three", "en", "s", 40),
            (3, "yet another unrelated document body here now", "en", "s", 40),
            (0, "unique new document with fresh content words", "en", "s", 40),
            (4, boiler, "en", "s", len(boiler)),
            (8, "second unique new document nothing shared at all", "en", "s", 48),
        ],
    )
    got = dedup.incremental_minhash_dedup(spark, d).toPandas().set_index("doc_id")
    assert set(got.index) == {0, 4, 8}
    assert got.loc[4, "n_matches"] == 1 and got.loc[4, "dup_of"] == 1
    assert got.loc[4, "max_jaccard"] == 1.0
    assert got.loc[0, "n_matches"] == 0 and pd.isna(got.loc[0, "dup_of"])
    assert got.loc[8, "n_matches"] == 0


def test_collocations_lift_hand_counts(spark, tmp_path):
    """Corpus: 'x y' x6 and 'p q' x5 plus filler unigram docs. Unigrams:
    x=6, y=6, p=5, q=5, filler f=4 -> N=26. Bigrams >= 5 support:
    (x,y)=6 -> lift = 1000*6*26 // 36 = 4333; (p,q)=5 -> 1000*5*26 //
    25 = 5200. Rarer pair ranks HIGHER (lift rewards exclusivity)."""
    from flink_gmall_spark.operators import curation

    rows = [(i, "x y", "en", "s", 3) for i in range(6)]
    rows += [(10 + i, "p q", "en", "s", 3) for i in range(5)]
    rows += [(20 + i, "f", "en", "s", 1) for i in range(4)]
    d = _write_docs(spark, tmp_path, rows)
    got = curation.collocations_lift(spark, d).toPandas()
    assert got.pair.tolist() == ["p q", "x y"]
    assert got.lift_x1000.tolist() == [5200, 4333]
    assert got.ct.tolist() == [5, 6]


def test_hll_union_rollup_exact_and_bounds(spark, tmp_path):
    """lang aa: 2 distinct texts (one duplicated), lang bb: 1 ->
    *ALL* = 3 distinct. All sketch-vs-exact booleans must hold."""
    from flink_gmall_spark.operators import textstats

    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "first text", "aa", "s", 10),
            (2, "first text", "aa", "s", 10),
            (3, "second text", "aa", "s", 11),
            (4, "third text", "bb", "s", 10),
        ],
    )
    got = textstats.hll_union_rollup(spark, d).toPandas().set_index("lang")
    assert got.loc["aa", "exact_distinct"] == 2
    assert got.loc["bb", "exact_distinct"] == 1
    assert got.loc["*ALL*", "exact_distinct"] == 3
    assert got.hll_ok.all()


def test_bpe_encode_applies_trained_merges(spark, tmp_path):
    """Same corpus as the trainer test: 'aaab' x3 + 'ab' x2. Learned
    merges collapse both words into single symbols ('a a' -> 'aa',
    'a b' -> 'ab', 'aa ab' -> 'aaab'; round 4 finds no pairs and stops),
    so the encoded vocabulary is exactly {aaab: ct 3, ab: ct 2}."""
    from flink_gmall_spark.operators import curation

    rows = [(i, "aaab", "en", "s", 4) for i in range(3)]
    rows += [(10 + i, "ab", "en", "s", 2) for i in range(2)]
    d = _write_docs(spark, tmp_path, rows)
    got = (
        curation.bpe_encode_corpus(spark, d).toPandas().set_index("symbol")
    )
    assert set(got.index) == {"aaab", "ab"}
    assert got.loc["aaab", "ct"] == 3 and got.loc["aaab", "n_words"] == 1
    assert got.loc["ab", "ct"] == 2 and got.loc["ab", "n_words"] == 1


def test_hashed_classifier_matches_python_model(spark, tmp_path):
    """Engine score must equal the pure-Python feature-hash model
    (md5-hex bucketing into the frozen CLS_WEIGHTS vector)."""
    import hashlib

    from flink_gmall_spark.operators import textstats

    def model_score(text):
        toks = [t for t in "".join(
            c if c.isalnum() else " " for c in text.lower()
        ).split() if t]
        s = 0
        for tok in toks:
            h = hashlib.md5(tok.encode()).hexdigest()
            idx = int(h[0], 16) * 16 + int(h[1], 16)  # 0-based bucket
            s += textstats.CLS_WEIGHTS[idx]
        return s

    texts = ["a", "the quick brown fox", "zzz yyy xxx qqq", "mixed 123 tokens here"]
    d = _write_docs(
        spark, tmp_path, [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    )
    got = (
        textstats.hashed_classifier_scores(spark, d).toPandas().set_index("doc_id")
    )
    for i, t in enumerate(texts):
        want = model_score(t)
        assert got.loc[i, "score"] == want, (t, want, got.loc[i, "score"])
        assert got.loc[i, "label"] == ("keep" if want >= 0 else "drop")


def test_bpe_token_budget_hand_counts(spark, tmp_path):
    """Corpus 'aaab' x3 + 'ab' x2 + one OOV-domain token '7' (digits are
    outside the trainer dictionary): trained merges collapse 'aaab' and
    'ab' to 1 symbol each, OOV counts 1 via the fallback tier. Doc 0 =
    'aaab ab 7' -> 3 words, 3 bpe tokens; docs 1-2 = 'aaab' -> 1/1;
    docs 10-11 = 'ab' -> 1/1... wait doc 0 contributes one 'aaab' and one
    'ab' to the dictionary corpus too — merges still fully collapse."""
    from flink_gmall_spark.operators import curation

    rows = [(0, "aaab ab 7", "en", "s", 9)]
    rows += [(i, "aaab", "en", "s", 4) for i in (1, 2)]
    rows += [(10 + i, "ab", "en", "s", 2) for i in range(2)]
    d = _write_docs(spark, tmp_path, rows)
    got = curation.bpe_token_budget(spark, d).toPandas().set_index("doc_id")
    assert got.loc[0, "n_words"] == 3 and got.loc[0, "n_bpe_tokens"] == 3
    for i in (1, 2, 10, 11):
        assert got.loc[i, "n_words"] == 1 and got.loc[i, "n_bpe_tokens"] == 1


def _duck_docs(docs_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs_dir}/documents.parquet/*.parquet')"
    )
    return con


def _compare_bpe_trio(spark, d, tag):
    from flink_gmall_spark.operators import curation
    from tests.oracle import compare

    con = _duck_docs(d)
    try:
        compare(spark.createDataFrame(
            curation.bpe_train_merges(spark, d).collect() or [],
            "rank bigint, pair string, ct bigint"),
            con, curation.ORACLE_BPE_TRAIN, name=f"bpe_train_{tag}")
        compare(curation.bpe_encode_corpus(spark, d), con,
                curation.ORACLE_BPE_ENCODE, name=f"bpe_encode_{tag}")
        compare(curation.bpe_token_budget(spark, d), con,
                curation.ORACLE_BPE_TOKEN_BUDGET, name=f"bpe_budget_{tag}")
    finally:
        con.close()


def test_bpe_oracles_survive_dried_up_training(spark, tmp_path):
    """Regression (review finding): when training dries up before
    BPE_TRAIN_MERGES rounds, the unrolled oracle stages' empty best-pair
    b{k} must NOT empty the dictionary. Corpus 'aaab' x3 + 'ab' x2
    learns exactly 3 merges and every word is then fully merged, so
    rounds 4 AND 5 are BOTH dry — the NULL guard must pass w3 through
    two consecutive empty-b stages (verified: trainer returns 3 rows)."""
    from flink_gmall_spark.operators import curation

    rows = [(i, "aaab", "en", "s", 4) for i in range(3)]
    rows += [(10 + i, "ab", "en", "s", 2) for i in range(2)]
    d = _write_docs(spark, tmp_path, rows)
    assert curation.bpe_train_merges(spark, d).count() == 3
    _compare_bpe_trio(spark, d, "dry2")


def test_bpe_oracles_with_leftover_multisymbol_words(spark, tmp_path):
    """The complementary serve-path case (a corpus cannot have BOTH dry
    rounds and leftover multi-symbol words — any unmerged pair is a merge
    candidate): three tied 1-count pairs ('cd','ef','gh') fill rounds
    4-5 after the 'aaab'/'ab' merges, leaving 'gh' symbolized as
    ['g','h'] in w5 — the budget oracle must count its 2 symbols and the
    encode oracle must emit 'g' and 'h' as separate vocabulary rows."""
    from flink_gmall_spark.operators import curation

    rows = [(i, "aaab", "en", "s", 4) for i in range(3)]
    rows += [(10 + i, "ab", "en", "s", 2) for i in range(2)]
    rows += [(20, "cd", "en", "s", 2), (21, "ef", "en", "s", 2), (22, "gh", "en", "s", 2)]
    d = _write_docs(spark, tmp_path, rows)
    got = curation.bpe_token_budget(spark, d).toPandas().set_index("doc_id")
    assert got.loc[22, "n_bpe_tokens"] == 2  # 'gh' stays ['g','h']
    assert got.loc[20, "n_bpe_tokens"] == 1  # 'cd' merged in round 4
    _compare_bpe_trio(spark, d, "leftover")


def test_timed_funnel_zero_views_degrades_to_null(spark, tmp_path):
    """Regression (review finding): zero 'view' events must yield a
    (0, 0, NULL) ledger in BOTH engines, not an ANSI DIVIDE_BY_ZERO."""
    import os

    import duckdb

    from flink_gmall_spark.plans import ads
    from pyspark.sql import types as T
    from tests.oracle import compare

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0), 7, "purchase", 5.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 11, 0, 0), 8, "click", 1.0, "{}"),
    ]
    d = str(tmp_path / "ev")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    got = ads.timed_funnel(spark, d).collect()[0]
    assert got["viewed"] == 0 and got["converted"] == 0
    assert got["conv_rate_x100"] is None
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    try:
        compare(ads.timed_funnel(spark, d), con, ads.ORACLE_TIMED_FUNNEL,
                name="timed_funnel_zero_views")
    finally:
        con.close()
