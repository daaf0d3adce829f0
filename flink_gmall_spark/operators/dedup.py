"""Deduplication operators for large-scale training-data pipelines.

Beyond the gmall reference surface (BASELINE.json north star): exact
dedup, n-gram Jaccard near-dup, MinHash+LSH near-dup (batch AND
incremental-ingest), SimHash fingerprinting, chunk-level and
within-document first-occurrence dedup, transitive cluster
representatives, and the hash-pinned LSH recall ledger, all over the
``documents`` table.

Scale design (100 TB point):
- Exact dedup is a single hash aggregation on md5(text) — pure shuffle on
  a 128-bit key, no driver state.
- N-gram Jaccard self-joins on shingles; a document-frequency cap
  (MAX_SHINGLE_DF) drops ubiquitous shingles so no single shuffle key
  explodes quadratically — the standard frequent-shingle guard. AQE skew
  join covers the residual tail.
- MinHash uses ``BANDS`` bands x ``ROWS_PER_BAND`` hashes; candidate pairs
  come from equality on a band signature (an equi-join, shuffle-friendly),
  then exact Jaccard verifies. Collision probability for similarity s is
  1-(1-s^r)^b — 0.97 recall at s=0.6 with b=8, r=2.
- Hashes are md5 hex *strings* (lexicographic min) — portable bit-for-bit
  between Spark and DuckDB, so every step is oracle-checkable.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_gmall_spark.functions.tokenize import TOKEN_SPLIT_RE, tokens_col
from flink_gmall_spark.session import tune
from flink_gmall_spark.sources import load, spread_small_scan

SHINGLE_K = 3
MAX_SHINGLE_DF = 100  # frequent-shingle guard (see module docstring)
JACCARD_THRESHOLD = 0.6
BANDS = 8
ROWS_PER_BAND = 2
CHUNK_HEX = 4  # each min-hash = a 16-bit (4-hex) chunk of md5(s)||md5('x'||s)


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group documents by content hash, keep the smallest id."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("dup_ct"),
    )


ORACLE_EXACT_DEDUP = """
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS dup_ct
FROM documents
GROUP BY 1
"""


# How the document-frequency cap is applied (semantics identical; the
# choice is a physical strategy, like AQE picking a join):
# - "window": one shuffle by shingle + windowed count. The exchange on s
#   is then REUSED by the verification self-join (also keyed on s), so the
#   whole operator runs with the minimum stage count — fastest up to
#   ~corpus-fits-in-cluster-memory scales.
# - "antijoin": document frequencies via partial (map-side) aggregation,
#   then a broadcast anti-join against the tiny frequent-shingle set. The
#   raw posting rows of a hot shingle (stopword trigram at billions of
#   docs) never concentrate on one reducer — the skew-safe plan for the
#   100 TB point, at the cost of recomputing the narrow explode subtree
#   per consumer. Window functions have no partial aggregation and no AQE
#   skew splitting, hence the switch.
FREQ_FILTER_STRATEGY = "window"


def shingle_array(docs: DataFrame) -> DataFrame:
    """Per-row DISTINCT shingle array (doc_id, sh_arr) WITHOUT the corpus
    DF cap — for consumers that need the per-doc set as a VALUE (the
    streaming containment probe carries its own set size through a
    single aggregation). Deliberately NOT the building block of
    raw_shingles: composing raw_shingles as explode(shingle_array)
    splits the array computation into its own Project below the
    Generate, and the materialized-array plan measured ~19x slower on
    the sf0.1 shingle scan (0.6 s -> 10.9 s warm) than the fused
    Generate(explode(array_distinct(...))) form — a 13x regression on
    curation_decontaminate before it was caught. Keep the explode fused
    inside raw_shingles; keep this per-row form for streaming callers
    whose per-batch doc count is small."""
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") >= SHINGLE_K
    )
    # Spark SQL array indexing is 0-based: i in [0, n-k]
    return toks.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, size(t) - {SHINGLE_K}),"
                " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
            )
        ).alias("sh_arr"),
    )


def raw_shingles(docs: DataFrame) -> DataFrame:
    """Distinct word-k-gram shingles per doc WITHOUT the corpus DF cap —
    a pure per-row map (split/transform/explode, no aggregation), so it
    runs unchanged on a STREAMING DataFrame. Batch callers get the cap
    through _shingles; streaming callers apply the batch-maintained
    frequent-shingle block list instead (stream_decontaminate_bloom).

    The explode is FUSED over the array expression on purpose — see
    shingle_array's docstring for the measured plan regression when the
    array is materialized in a separate Project first."""
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") >= SHINGLE_K
    )
    # Spark SQL array indexing is 0-based: i in [0, n-k]
    return toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(t) - {SHINGLE_K}),"
                    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            )
        ).alias("s"),
    )


def _shingles(docs: DataFrame, strategy: str | None = None) -> DataFrame:
    """Distinct word-k-gram shingles per doc, with the document-frequency
    cap applied. Stays fully JVM-side (split/transform/explode)."""
    sh = raw_shingles(docs)
    if (strategy or FREQ_FILTER_STRATEGY) == "window":
        return (
            sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("s")))
            .filter(F.col("df") <= MAX_SHINGLE_DF)
            .select("doc_id", "s")
        )
    frequent = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
        .select("s")
    )
    return sh.join(frequent, "s", "left_anti").select("doc_id", "s")


# DuckDB mirror of _shingles (1-based lists; range() end-exclusive).
_DUCK_SHINGLES = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                       x -> x <> '') AS t
    FROM documents
),
sh_all AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, len(t) - {SHINGLE_K - 2}),
               i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))) AS s
    FROM toks
    WHERE len(t) >= {SHINGLE_K}
),
rare AS (
    SELECT s FROM sh_all GROUP BY s HAVING count(*) <= {MAX_SHINGLE_DF}
),
sh AS (
    SELECT sh_all.doc_id, sh_all.s FROM sh_all JOIN rare USING (s)
),
sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
)
"""


def _pair_jaccard(
    sh: DataFrame,
    pairs: DataFrame | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard for doc pairs sharing >=1 shingle (optionally
    restricted to candidate ``pairs``). Integer counts + one double
    division — bit-identical in both engines. Callers that already
    aggregate per-doc (minhash signatures) pass their shingle counts in as
    ``sizes`` so the per-doc aggregation is planned once and reused.

    Scale note: with candidates given, the shingle self-join runs only
    over documents that appear in some candidate pair (semi-join
    reduction) — verification cost tracks the candidate count, not the
    corpus size. Result is identical to filtering the all-pairs commons.
    No broadcast hints / persist barriers here: the whole operator stays
    one declarative DAG so Catalyst's ReuseExchange dedupes the repeated
    shingle subtree and AQE picks broadcast sides from runtime stats
    (hint-forced broadcasts spawned jobs that each recomputed the
    upstream DAG — measured 4x slower).
    """
    if sizes is None:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    if pairs is not None:
        # no distinct: left_semi tolerates duplicate keys on the right
        cand_docs = pairs.select(F.col("doc_a").alias("doc_id")).union(
            pairs.select(F.col("doc_b").alias("doc_id"))
        )
        sh = sh.join(cand_docs, "doc_id", "left_semi")
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if pairs is not None:
        common = common.join(pairs, ["doc_a", "doc_b"])
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")),
        )
    )
    return jac.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "jaccard"
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact n-gram-shingle Jaccard (all-pairs over
    the shared-shingle join — the correctness baseline for minhash_lsh)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return _pair_jaccard(_shingles(docs))


ORACLE_NGRAM_JACCARD = f"""{_DUCK_SHINGLES},
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard
FROM common
JOIN sizes x ON doc_a = x.doc_id
JOIN sizes y ON doc_b = y.doc_id
WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}
"""


def _band_sigs(sh: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Banded min-hash signatures from the shingle table. Returns
    ``(sig_wide, sig)``: the per-doc wide row (shingle count ``n`` + all
    BANDS x ROWS_PER_BAND min-hashes) and its stacked (doc_id, band, sig)
    form — the LSH bucket keys.

    All min-hashes come from ONE aggregation pass over the shingles (no
    row explosion before the shuffle), and all 16 hash functions derive as
    16-bit chunks of just TWO md5 calls per shingle (8x less hashing than
    md5-per-band; measured same candidate selectivity at sf0.1: 1,252 vs
    1,298). r=2 squares away the higher 16-bit collision rate, and
    exact-Jaccard verification removes any residual false positives. The
    shingle count rides along in the same aggregation — the Jaccard
    denominator sizes come for free from the signature shuffle."""
    hashed = sh.withColumn("h", F.expr("concat(md5(s), md5(concat('x', s)))"))
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.min(F.expr(f"substring(h, {1 + c * CHUNK_HEX}, {CHUNK_HEX})")).alias(f"m{c}")
        for c in range(BANDS * ROWS_PER_BAND)
    ]
    sig_wide = hashed.groupBy("doc_id").agg(*aggs)
    stack_args = ", ".join(
        f"{b}, concat(m{b * ROWS_PER_BAND}, m{b * ROWS_PER_BAND + 1})"
        for b in range(BANDS)
    )
    sig = sig_wide.selectExpr("doc_id", f"stack({BANDS}, {stack_args}) AS (band, sig)")
    return sig_wide, sig


def minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, materialize_shingles: bool = False
) -> DataFrame:
    """MinHash+LSH near-dup: banded min-hash signatures generate candidate
    pairs via an equi-join; exact Jaccard verifies. The scale path — work
    is O(docs x bands) + a join on band signatures, never all-pairs.

    ``materialize_shingles`` snapshots the shingle subtree to parquet and
    re-reads it, so the three consumers (signatures, verify-a, verify-b)
    scan a file instead of recomputing tokenize+explode. Measured at
    sf0.1/local[32]: first (cold-plan) run 4.6 s vs 10.6 s baseline, but
    steady-state 2.9 s vs 2.8 s — AQE exchange reuse already dedupes the
    subtree at runtime, so the default stays off; the flag is the right
    call only for cold single-shot runs or when the shingle set feeds
    MANY separate actions (e.g. iterative connected components over a
    fresh corpus)."""
    tune(spark)
    # NO spread_small_scan here — measured at sf0.1 (r16, two
    # interleaved pairs): 2.77 vs 2.39 s / 2.48 vs 2.40 s — this plan
    # stays declarative (no checkpoint), and the spread exchange feeds
    # consumers AQE exchange reuse already dedupes, so it is pure
    # added cost; contrast minhash_band_tuning, whose eager shingle
    # CHECKPOINT is a real single-task barrier the spread does break.
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    if materialize_shingles:
        import hashlib as _hl
        import os as _os

        from flink_gmall_spark.scratch import scratch_dir

        # app id in the tag: two concurrent sessions (driver + CI) on the
        # same sf_dir must not overwrite each other's parquet mid-read —
        # same race scale._bucketed_table guards against.
        app = spark.sparkContext.applicationId
        tag = _hl.md5(f"{_os.path.realpath(sf_dir)}|{app}".encode()).hexdigest()[:8]
        p = scratch_dir("shingles", tag)
        sh.write.mode("overwrite").parquet(p)
        sh = spark.read.parquet(p)
    sig_wide, sig = _band_sigs(sh)
    a = sig.alias("a")
    b = sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _pair_jaccard(sh, pairs=cand, sizes=sig_wide.select("doc_id", "n"))


# DuckDB mirror of the chunked banded signatures + candidate join.
_DUCK_SIG_CTES = f"""
hashed AS (
    SELECT doc_id, s, md5(s) || md5('x' || s) AS h FROM sh
),
sig AS (
    SELECT doc_id, b AS band,
           min(substring(h, 1 + ({ROWS_PER_BAND}*b)*{CHUNK_HEX}, {CHUNK_HEX}))
           || min(substring(h, 1 + ({ROWS_PER_BAND}*b+1)*{CHUNK_HEX}, {CHUNK_HEX})) AS sig
    FROM hashed, (SELECT unnest(range(0, {BANDS})) AS b)
    GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""

ORACLE_MINHASH_LSH = f"""{_DUCK_SHINGLES},
{_DUCK_SIG_CTES},
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard
FROM common c
JOIN cand USING (doc_a, doc_b)
JOIN sizes x ON c.doc_a = x.doc_id
JOIN sizes y ON c.doc_b = y.doc_id
WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}
"""


def apply_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-filtering form of near-dedup: return the documents that
    SURVIVE MinHash+LSH dedup under the greedy keep-smallest-id policy
    (a document drops iff it near-duplicates a smaller-id document).

    One anti-join over the pair list — the single-pass policy production
    pipelines use in place of full transitive clustering (which needs
    iterative connected components; that trade is deliberate and
    documented). Output is the kept doc ids + their fingerprint-relevant
    stats, ready to feed the text-analysis operators.
    """
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(spark, sf_dir)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        docs.join(losers, "doc_id", "left_anti")
        .select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
    )


ORACLE_APPLY_NEAR_DEDUP = f"""{_DUCK_SHINGLES},
{_DUCK_SIG_CTES},
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
losers AS (
    SELECT DISTINCT c.doc_b AS doc_id
    FROM common c
    JOIN cand USING (doc_a, doc_b)
    JOIN sizes x ON c.doc_a = x.doc_id
    JOIN sizes y ON c.doc_b = y.doc_id
    WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}
)
SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
"""


CC_MAX_ITERATIONS = 20


def connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: connected components over the
    MinHash pair graph by iterative min-label propagation (the
    large-star/small-star family, simplified to symmetric propagation).

    The engine's iterative-algorithm surface: a driver loop of DataFrame
    joins with a convergence action per round, bounded by the component
    diameter (≤ CC_MAX_ITERATIONS). Each doc ends labeled with the
    smallest doc_id reachable through near-duplicate pairs — the full
    transitive upgrade of apply_near_dedup's greedy policy. Singleton docs
    label themselves. At 100 TB each round is one shuffle join; diameters
    of near-dup clusters are tiny in practice (pairs are ~cliques).
    """
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # symmetric edge list; isolated docs simply keep their own label
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = docs.select(
        F.col("doc_id"), F.col("doc_id").alias("cluster_id")
    ).persist()
    changed = 0
    for _ in range(CC_MAX_ITERATIONS):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") < F.col("o.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # Unconverged labels are silently wrong (non-transitive); the
        # oracle's recursive closure would mismatch with no diagnostic.
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{CC_MAX_ITERATIONS} rounds ({changed} labels still "
            "improving); raise CC_MAX_ITERATIONS for graphs with "
            "diameter beyond it"
        )
    return labels.select("doc_id", "cluster_id")


# the walk CTE is recursive — RECURSIVE must be declared on the first WITH
ORACLE_CONNECTED_COMPONENTS = f"""{_DUCK_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)},
{_DUCK_SIG_CTES},
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT c.doc_a, c.doc_b
    FROM common c
    JOIN cand USING (doc_a, doc_b)
    JOIN sizes x ON c.doc_a = x.doc_id
    JOIN sizes y ON c.doc_b = y.doc_id
    WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
walk AS (
    SELECT doc_id, doc_id AS label FROM documents
    UNION
    SELECT e.dst AS doc_id, w.label
    FROM walk w JOIN edges e ON w.doc_id = e.src
)
SELECT doc_id, CAST(min(label) AS BIGINT) AS cluster_id
FROM walk
GROUP BY doc_id
"""


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 64-bit document fingerprints (as a 64-char bit string).

    Per distinct token: md5's leading 16 hex digits give 64 bits; each bit
    votes +/-1 per containing doc; the sign of the per-position vote sum is
    the fingerprint bit (ties -> 1).

    r16 shape (guide §2.3/§2.4; VERDICT r15 ask #2): the former plan
    materialized a distinct-vocabulary table, exploded it 64x into
    per-(token, bit-index) vote rows, broadcast-joined those back to
    doc-tokens and aggregated twice (groupBy(doc_id, j) then
    groupBy(doc_id) collect_list) — 3 exchanges, 2 document scans, a
    broadcast build, and 64 rows per doc-token flowing into the partial
    aggregate. Now each doc-token row computes its md5 once, splits the
    leading 16 hex chars into two 32-bit halves, and ONE
    groupBy(doc_id) aggregates 64 conditional bit-sums plus the token
    count: per-position vote sum sv_j = 2*s_j - n (each token votes
    2*bit_j - 1), so the fingerprint bit is s_j*2 >= n — one exchange
    row per document (65 longs), zero joins, one scan. At 100 TB this
    trades vocabulary-sized md5 work for doc-token-sized md5 work but
    removes the 64x per-occurrence row blowup between the join and the
    aggregate, which dominates: the exchange carries ~520 bytes/doc
    instead of 64 partial rows/doc, and the broadcast (vocab x 64 rows)
    disappears. Equivalence is pinned by tests/test_analytics_ops.py
    (hand-computed bits) and the DuckDB oracle (unchanged).
    """
    tune(spark)
    # NO spread_small_scan here — measured at sf0.1 (r16, two
    # interleaved pairs): 1.63/1.83 s spread vs 1.39/1.53 s unspread;
    # the per-token md5 fold is too cheap to amortize the extra
    # exchange against a 5000-doc scan.
    docs = load(spark, sf_dir, "documents")
    # bit j (0..63, MSB-first over md5's leading 16 hex chars) lives in
    # hi (chars 1-8) for j < 32, lo (chars 9-16) for j >= 32; conv() of
    # 8 hex chars fits a BIGINT with no sign trouble.
    doc_toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("tok")
    ).select(
        "doc_id",
        F.expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)").alias("hi"),
        F.expr("cast(conv(substring(md5(tok), 9, 8), 16, 10) as bigint)").alias("lo"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(64):
        half, shift = ("hi", 31 - j) if j < 32 else ("lo", 63 - j)
        aggs.append(
            F.sum(F.expr(f"shiftright({half}, {shift}) & 1")).alias(f"s{j}")
        )
    sums = doc_toks.groupBy("doc_id").agg(*aggs)
    # sign of the vote sum: sv_j = 2*s_j - n >= 0  <=>  2*s_j >= n
    bits = [
        F.when(F.col(f"s{j}") * 2 >= F.col("n"), F.lit("1")).otherwise(F.lit("0"))
        for j in range(64)
    ]
    return sums.select("doc_id", F.concat(*bits).alias("simhash"))


HAMMING_THRESHOLD = 3
SIMHASH_BANDS = 4  # pigeonhole: hamming<=3 over 64 bits => >=1 of 4 16-bit bands equal


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: candidates share at least one exact 16-bit
    band of the 64-bit fingerprint (pigeonhole-complete for hamming <=
    HAMMING_THRESHOLD since 3 differing bits cannot touch all 4 bands),
    then the exact hamming distance filters. Candidate generation is an
    equi-join on (band_idx, band_bits) — never all-pairs.

    Scope note (measured on this corpus): simhash is the web-scale
    primitive for FEATURE-RICH documents; with ~30 distinct tokens per doc
    the per-bit vote sums sit near zero, so fingerprints are coarse —
    token-set-similar docs collide at hamming 0 while 0.99-shingle-jaccard
    pairs can land beyond the threshold. MinHash (minhash_lsh_pairs) is
    the primary near-dup contract here; this operator exists for the
    long-document regime and is oracle-exact either way.
    """
    tune(spark)
    fp = simhash_fingerprints(spark, sf_dir)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.expr(f"sequence(0, {SIMHASH_BANDS - 1})")).alias("bi"),
    ).withColumn("bits", F.expr("substring(simhash, 1 + bi * 16, 16)"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.expr(
        "64 - size(filter(sequence(1, 64), i -> substring(ha, i, 1) = substring(hb, i, 1)))"
    ).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
        .select("doc_a", "doc_b", "hamming")
    )


ORACLE_SIMHASH_PAIRS = f"""
WITH doc_toks AS (
    SELECT doc_id,
           unnest(list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS tok
    FROM documents
),
vocab AS (SELECT DISTINCT tok FROM doc_toks),
vocab_bits AS (
    SELECT tok, j,
           2 * (((instr('0123456789abcdef', substring(md5(tok), 1 + CAST(j // 4 AS INT), 1)) - 1)
                >> (3 - j % 4)) & 1) - 1 AS vote
    FROM vocab, (SELECT unnest(range(0, 64)) AS j)
),
votes AS (
    SELECT d.doc_id, v.j,
           CASE WHEN sum(v.vote) >= 0 THEN '1' ELSE '0' END AS bit
    FROM doc_toks d JOIN vocab_bits v USING (tok)
    GROUP BY 1, 2
),
fp AS (
    SELECT doc_id, string_agg(bit, '' ORDER BY j) AS simhash
    FROM votes GROUP BY doc_id
),
bands AS (
    SELECT doc_id, simhash, bi, substring(simhash, 1 + bi * 16, 16) AS bits
    FROM fp, (SELECT unnest(range(0, {SIMHASH_BANDS})) AS bi)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS ha, b.simhash AS hb
    FROM bands a JOIN bands b
      ON a.bi = b.bi AND a.bits = b.bits AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(64 - len(list_filter(range(1, 65), i -> substring(ha, i, 1) = substring(hb, i, 1))) AS BIGINT) AS hamming
FROM cand
WHERE 64 - len(list_filter(range(1, 65), i -> substring(ha, i, 1) = substring(hb, i, 1))) <= {HAMMING_THRESHOLD}
"""


ORACLE_SIMHASH = """
WITH doc_toks AS (
    SELECT doc_id,
           unnest(list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS tok
    FROM documents
),
vocab AS (SELECT DISTINCT tok FROM doc_toks),
vocab_bits AS (
    SELECT tok, j,
           2 * (((instr('0123456789abcdef', substring(md5(tok), 1 + CAST(j // 4 AS INT), 1)) - 1)
                >> (3 - j % 4)) & 1) - 1 AS vote
    FROM vocab, (SELECT unnest(range(0, 64)) AS j)
),
votes AS (
    SELECT d.doc_id, v.j,
           CASE WHEN sum(v.vote) >= 0 THEN '1' ELSE '0' END AS bit
    FROM doc_toks d JOIN vocab_bits v USING (tok)
    GROUP BY 1, 2
)
SELECT doc_id, string_agg(bit, '' ORDER BY j) AS simhash
FROM votes
GROUP BY doc_id
"""


def bag_of_words_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation-invariant dedup: documents grouped by the fingerprint
    of their SORTED token multiset, so reordered/shuffled copies collapse
    into one group — the dup class exact hashing misses and shingle
    methods only partially catch (word order destroys most shingles).
    Same single-hash-aggregation scale shape as exact_dedup."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.array_sort(tokens_col("text")), " "))
    return docs.groupBy(fp.alias("bow_fp")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("dup_ct"),
    )


ORACLE_BAG_OF_WORDS = f"""
SELECT md5(array_to_string(list_sort(
           list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                       x -> x <> '')), ' ')) AS bow_fp,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS dup_ct
FROM documents
GROUP BY 1
"""


CHUNK_DEDUP_W = 3  # tokens per dedup chunk (the "line" unit; see docstring)


def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level first-occurrence dedup — the RefinedWeb/Dolma
    "line-level dedup" pass: a repeated span survives only at its first
    corpus occurrence (boilerplate headers/footers vanish from every
    other document), ordered by (doc_id, position). The driver corpus has
    no newlines, so the line unit is a deterministic fixed-width token
    chunk (CHUNK_DEDUP_W; a production corpus would split on '\\n' and
    the rest of the plan is unchanged).

    Scale shape (100 TB): explode → ONE hash aggregation keyed on
    md5(chunk) computing min (doc_id, idx) — partial map-side min, so a
    boilerplate chunk repeated a billion times aggregates to one row per
    map task before the shuffle — then an equi-join back on the 128-bit
    key to flag survivors, and a per-doc reduce. No windows over raw
    postings, no all-pairs; skew on hot chunks is absorbed by the partial
    agg, and the final groupBy(doc_id) is the natural output partitioning
    for a downstream rewrite of the kept text.
    """
    tune(spark)
    W = CHUNK_DEDUP_W
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") > 0
    )
    ch = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (size(t) - 1) DIV {W}),"
                f" i -> concat_ws(' ', slice(t, i * {W} + 1, {W})))"
            )
        ).alias("idx", "chunk"),
    ).withColumn("n_tok", F.size(F.split("chunk", " "))).withColumn(
        "h", F.md5("chunk")
    )
    firsts = ch.groupBy("h").agg(F.min(F.struct("doc_id", "idx")).alias("f"))
    keep = (F.col("doc_id") == F.col("f.doc_id")) & (F.col("idx") == F.col("f.idx"))
    return (
        ch.join(firsts, "h")
        .withColumn("keep", keep)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("keep").cast("long")).alias("kept_chunks"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


ORACLE_CHUNK_DEDUP = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                       x -> x <> '') AS t
    FROM documents
),
ch AS (
    SELECT doc_id, i AS idx,
           array_to_string(t[i*{CHUNK_DEDUP_W}+1 : i*{CHUNK_DEDUP_W}+{CHUNK_DEDUP_W}], ' ') AS chunk,
           len(t[i*{CHUNK_DEDUP_W}+1 : i*{CHUNK_DEDUP_W}+{CHUNK_DEDUP_W}]) AS n_tok
    FROM toks, UNNEST(range(0, ((len(t)-1)//{CHUNK_DEDUP_W})+1)) AS u(i)
    WHERE len(t) > 0
),
flagged AS (
    SELECT doc_id, idx, n_tok,
           row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) = 1 AS keep
    FROM ch
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
FROM flagged
GROUP BY doc_id
"""


def cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transitive near-dup dedup END-TO-END: MinHash pairs →
    connected components → ONE representative per cluster (the min-id
    member, which IS the cluster label under min-label propagation) with
    the cluster's size and total retained chars — the table a corpus
    dedup job actually ships (keep list + dedup accounting), upgrading
    apply_near_dedup's greedy single-pass policy to full transitivity.

    Scale shape: everything before the final rollup is the already-audited
    banded-LSH + bounded-iteration propagation; the rollup itself is one
    partial-agg shuffle keyed on cluster_id (cluster sizes are bounded by
    near-dup cliques, no hot key)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    labels = connected_components(spark, sf_dir)
    j = labels.join(docs.select("doc_id", "n_chars"), "doc_id")
    return j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
    )


_CC_PREFIX = ORACLE_CONNECTED_COMPONENTS.rsplit(
    "SELECT doc_id, CAST(min(label)", 1
)[0]

ORACLE_CLUSTER_REPRESENTATIVES = (
    _CC_PREFIX
    + """,
labels AS (
    SELECT doc_id, CAST(min(label) AS BIGINT) AS cluster_id
    FROM walk
    GROUP BY doc_id
)
SELECT l.cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM labels l JOIN documents d USING (doc_id)
GROUP BY l.cluster_id
"""
)


def intra_doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-DOCUMENT chunk dedup — the within-doc repetition-removal pass
    (Dolma's paragraph dedup applied inside each document): every repeated
    chunk survives only at its first occurrence IN THAT DOCUMENT, and the
    deduplicated text is reassembled in original order. Complements
    ``chunk_dedup`` (corpus-global first occurrence).

    Scale shape (100 TB): fully map-only — tokens → fixed-width chunks →
    order-preserving ``array_distinct``, all inside one JVM expression per
    row. Zero shuffle, zero state; the operator scales linearly with
    corpus bytes and is embarrassingly parallel. (Spark's array_distinct
    keeps FIRST occurrences in array order — the oracle pins that contract
    with a (doc_id, chunk) first-idx window.)
    """
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return intra_doc_transform(docs)


def intra_doc_transform(docs: DataFrame) -> DataFrame:
    """The pure transform behind ``intra_doc_chunk_dedup`` — shared with
    its streaming twin (streaming.jobs.stream_intra_doc_chunks): map-only,
    so it runs unchanged under the incremental engine in append mode."""
    W = CHUNK_DEDUP_W
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") > 0
    )
    ch = toks.withColumn(
        "chunks",
        F.expr(
            f"transform(sequence(0, (size(t) - 1) DIV {W}),"
            f" i -> concat_ws(' ', slice(t, i * {W} + 1, {W})))"
        ),
    )
    return ch.select(
        "doc_id",
        F.size("chunks").cast("long").alias("n_chunks"),
        F.size(F.array_distinct("chunks")).cast("long").alias("kept_chunks"),
        F.concat_ws(" ", F.array_distinct("chunks")).alias("dedup_text"),
    )


ORACLE_INTRA_DOC_CHUNKS = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                       x -> x <> '') AS t
    FROM documents
),
ch AS (
    SELECT doc_id, i AS idx,
           array_to_string(t[i*{CHUNK_DEDUP_W}+1 : i*{CHUNK_DEDUP_W}+{CHUNK_DEDUP_W}], ' ') AS chunk
    FROM toks, UNNEST(range(0, ((len(t)-1)//{CHUNK_DEDUP_W})+1)) AS u(i)
    WHERE len(t) > 0
),
flagged AS (
    SELECT doc_id, idx, chunk,
           row_number() OVER (PARTITION BY doc_id, chunk ORDER BY idx) = 1 AS keep
    FROM ch
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE keep) AS dedup_text
FROM flagged
GROUP BY doc_id
"""


NEW_BATCH_MOD = 4  # doc_id % 4 == 0 plays the freshly-ingested batch


def incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a NEW batch of documents (doc_id %
    NEW_BATCH_MOD == 0 plays the fresh crawl) is near-dup-checked against
    the EXISTING corpus (the rest) — the shape every continuously-fed
    training pipeline runs on each ingest, where re-deduplicating the
    whole corpus per batch would be ruinous.

    Scale shape (100 TB corpus, small daily batch): in production the
    corpus side's banded min-hash signatures are a STORED table keyed by
    (band, sig) — only the new batch is shingled and hashed; here both
    sides recompute from the same fixture, but the join topology is
    identical: candidates come from the (band, sig) equi-join restricted
    to cross-batch pairs, so per-ingest cost tracks the batch's signature
    count, never corpus². Exact-Jaccard verification runs semi-join
    reduced to candidate docs only (see ``_pair_jaccard``). Output is the
    ingest decision per new doc: match count, the canonical duplicate
    target (min corpus doc_id), and the strongest verified similarity.
    """
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    sig_wide, sig = _band_sigs(sh)
    a = sig.alias("a")
    b = sig.alias("b")
    is_new_a = F.col("a.doc_id") % NEW_BATCH_MOD == 0
    is_new_b = F.col("b.doc_id") % NEW_BATCH_MOD == 0
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (is_new_a != is_new_b),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = _pair_jaccard(sh, pairs=cand, sizes=sig_wide.select("doc_id", "n"))
    new_a = F.col("doc_a") % NEW_BATCH_MOD == 0
    matches = verified.select(
        F.when(new_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_id"),
        F.when(new_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias("corpus_id"),
        "jaccard",
    )
    batch = docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0).select("doc_id")
    return (
        batch.join(matches, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.count("corpus_id").alias("n_matches"),
            F.min("corpus_id").alias("dup_of"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


ORACLE_INCREMENTAL_MINHASH = f"""{_DUCK_SHINGLES},
{_DUCK_SIG_CTES},
cross_cand AS (
    SELECT doc_a, doc_b FROM cand
    WHERE (doc_a % {NEW_BATCH_MOD} = 0) <> (doc_b % {NEW_BATCH_MOD} = 0)
),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
verified AS (
    SELECT c.doc_a, c.doc_b,
           CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard
    FROM common c
    JOIN cross_cand USING (doc_a, doc_b)
    JOIN sizes x ON c.doc_a = x.doc_id
    JOIN sizes y ON c.doc_b = y.doc_id
    WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}
),
matches AS (
    SELECT CASE WHEN doc_a % {NEW_BATCH_MOD} = 0 THEN doc_a ELSE doc_b END AS doc_id,
           CASE WHEN doc_a % {NEW_BATCH_MOD} = 0 THEN doc_b ELSE doc_a END AS corpus_id,
           jaccard
    FROM verified
)
SELECT d.doc_id,
       CAST(count(m.corpus_id) AS BIGINT) AS n_matches,
       min(m.corpus_id) AS dup_of,
       round(max(m.jaccard), 6) AS max_jaccard
FROM documents d LEFT JOIN matches m USING (doc_id)
WHERE d.doc_id % {NEW_BATCH_MOD} = 0
GROUP BY d.doc_id
"""


def lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline SELF-MEASUREMENT, the twin of sim_ann_recall_report
    for the near-dup family: how many of the TRUE near-dup pairs (exact
    n-gram Jaccard >= threshold, the all-pairs truth ngram_jaccard_pairs
    computes) did the banded MinHash+LSH candidate generation recover?
    One global integer ledger row — (true_pairs, found_pairs,
    missed_pairs) — hash-pinned, so band/row parameter regressions or a
    broken signature fail correctness outright. The theoretical recall at
    s=0.6 with b=8, r=2 is ~0.97 (module docstring); the ledger is the
    empirical companion the pipeline logs each run.

    Scale note: the truth side is the all-pairs shared-shingle join —
    affordable at audit scale (or on a sampled corpus partition at
    100 TB); the LSH side is the production path being audited.
    """
    tune(spark)
    return _recall_ledger(
        ngram_jaccard_pairs(spark, sf_dir), minhash_lsh_pairs(spark, sf_dir)
    )


def _recall_ledger(truth: DataFrame, found: DataFrame) -> DataFrame:
    """The (true_pairs, found_pairs, missed_pairs) audit fold shared by
    every candidate-generation recall report (LSH, winnowing) — one
    definition so the ledger shape cannot drift between families."""
    t = truth.select("doc_a", "doc_b")
    f_ = found.select("doc_a", "doc_b", F.lit(1).alias("hit"))
    j = t.join(f_, ["doc_a", "doc_b"], "left")
    return j.agg(
        F.count(F.lit(1)).alias("true_pairs"),
        F.count("hit").alias("found_pairs"),
        (F.count(F.lit(1)) - F.count("hit")).alias("missed_pairs"),
    )


def _oracle_recall_ledger(truth_sql: str, found_sql: str) -> str:
    """DuckDB twin of _recall_ledger, parameterized on the two pair
    subqueries."""
    return f"""
WITH truth AS (SELECT doc_a, doc_b FROM ({truth_sql}) t),
found AS (SELECT doc_a, doc_b FROM ({found_sql}) t)
SELECT CAST(count(*) AS BIGINT) AS true_pairs,
       CAST(count(f.doc_a) AS BIGINT) AS found_pairs,
       CAST(count(*) - count(f.doc_a) AS BIGINT) AS missed_pairs
FROM truth t
LEFT JOIN found f ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b
"""


ORACLE_LSH_RECALL_REPORT = _oracle_recall_ledger(
    ORACLE_NGRAM_JACCARD, ORACLE_MINHASH_LSH
)


CONTAINMENT_THRESHOLD = 0.8
# The threshold as an exact rational (4/5). The prefix length MUST be
# computed in integer arithmetic: floor((1-t)*n)+1 in doubles is one
# short whenever n is a multiple of 5 because 1.0-0.8 evaluates to
# 0.19999999999999996, which silently breaks the filter's 100%-recall
# guarantee at the containment==t boundary.
CONTAINMENT_NUM, CONTAINMENT_DEN = (
    Fraction(CONTAINMENT_THRESHOLD).limit_denominator(1000).as_integer_ratio()
)


def containment_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT near-dup — |A∩B| / |A| for the smaller
    shingle set A — the truncation/extension-dup case Jaccard
    under-scores when sizes diverge (a doc pasted inside a larger one).
    Candidates come from PREFIX FILTERING (the AllPairs/PPJoin family,
    Bayardo et al. WWW'07), not MinHash: order each doc's shingles by a
    canonical key (md5), keep only the first n - ceil(t*n) + 1 as probe
    keys (computed in INTEGER arithmetic — the float form floor((1-t)*n)+1
    is one short when n is a multiple of 5), and equi-join probes against
    the full shingle index. Any pair with containment >= t MUST share a
    probe key (if all n - ceil(t*n) + 1 probe shingles of A miss B, the
    overlap is at most ceil(t*n) - 1 < t*n), so
    unlike LSH the filter is EXACT — 100% recall, which is why the
    oracle below is plain all-pairs containment with no candidate
    mirror. Orientation: the probe side is the potential contained doc,
    (n, doc_id) lexicographically strictly smaller, so ties emit once.

    Scale shape: probe rows are ~(1-t) of the shingle table; the join
    key is the shingle string, per-key fanout bounded by the
    MAX_SHINGLE_DF cap (same guard as the Jaccard family); exact
    verification runs only over candidate docs via the shared
    _pair-style semi-join reduction. No all-pairs, no per-query scan —
    two shuffles on shingle / doc keys end to end."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    w = Window.partitionBy("doc_id").orderBy("pk", "s")
    ranked = sh.withColumn("pk", F.md5("s")).select(
        "doc_id",
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n"),
    )
    # p = n - ceil(t*n) + 1 exactly, via ceil(t*n) = (num*n + den - 1) div den
    # in pure integer arithmetic (no float rounding at the t==c/n boundary).
    c_min = F.expr(
        f"({CONTAINMENT_NUM}L * n + {CONTAINMENT_DEN - 1}L) div {CONTAINMENT_DEN}L"
    )
    prefix = ranked.filter(F.col("rn") <= F.col("n") - c_min + 1)
    idx = ranked.select(
        F.col("doc_id").alias("doc_b"), "s", F.col("n").alias("nb")
    )
    cand = (
        prefix.alias("p")
        .join(idx.alias("i"), "s")
        .filter(
            (F.col("p.n") < F.col("nb"))
            | ((F.col("p.n") == F.col("nb")) & (F.col("p.doc_id") < F.col("doc_b")))
        )
        .select(F.col("p.doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    sizes = ranked.filter(F.col("rn") == 1).select("doc_id", "n")
    cand_docs = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select(F.col("doc_b").alias("doc_id"))
    )
    shc = sh.join(cand_docs, "doc_id", "left_semi")
    common = (
        shc.alias("x")
        .join(
            shc.alias("y"),
            (F.col("x.s") == F.col("y.s"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
        .join(cand, ["doc_a", "doc_b"])
    )
    out = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .withColumn(
            "containment", F.col("common").cast("double") / F.col("na")
        )
    )
    return out.filter(F.col("containment") >= CONTAINMENT_THRESHOLD).select(
        F.col("doc_a").alias("contained_doc"),
        F.col("doc_b").alias("container_doc"),
        "containment",
    )


# No candidate mirror: prefix filtering is exact (100% recall), so the
# truth is plain all-pairs containment oriented to the smaller set.
ORACLE_CONTAINMENT_PREFIX = f"""{_DUCK_SHINGLES},
common AS (
    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
oriented AS (
    SELECT CASE WHEN (x.n, da) < (y.n, db) THEN da ELSE db END AS contained_doc,
           CASE WHEN (x.n, da) < (y.n, db) THEN db ELSE da END AS container_doc,
           CAST(c AS DOUBLE) / least(x.n, y.n) AS containment
    FROM common
    JOIN sizes x ON da = x.doc_id
    JOIN sizes y ON db = y.doc_id
)
SELECT contained_doc, container_doc, containment
FROM oriented WHERE containment >= {CONTAINMENT_THRESHOLD}
"""


def dedup_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline OBSERVABILITY: docs and chars surviving each stage
    of the family applied in production order — exact (content hash,
    keep smallest id) → near (MinHash+LSH pairs whose keeper survived
    the previous stage) → containment (drop docs contained in a
    surviving container) — the filter_funnel discipline applied to the
    dedup family, so a threshold or signature regression shows up as a
    stage-level survivor-count shift pinned by the hash contract, not a
    silent corpus drift. Four bounded rows.

    Stage semantics are SEQUENTIAL: a stage only drops a doc if the
    partner justifying the drop itself survived every earlier stage
    (semi-join on the keeper side before the anti-join), matching how a
    pipeline actually applies the passes. Scale shape: three anti-joins
    over doc ids + the audited pair generators — no new corpus passes
    beyond the stages being measured."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    keep = exact_dedup(spark, sf_dir).select(F.col("keep_id").alias("doc_id"))
    s1 = docs.join(keep, "doc_id", "left_semi")
    near = minhash_lsh_pairs(spark, sf_dir)
    drop2 = near.join(
        s1.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    ).select(F.col("doc_b").alias("doc_id"))
    s2 = s1.join(drop2, "doc_id", "left_anti")
    cont = containment_prefix_pairs(spark, sf_dir)
    drop3 = cont.join(
        s2.select(F.col("doc_id").alias("container_doc")),
        "container_doc",
        "left_semi",
    ).select(F.col("contained_doc").alias("doc_id"))
    s3 = s2.join(drop3, "doc_id", "left_anti")

    def stat(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_chars")

    return (
        stat(docs, "raw")
        .unionByName(stat(s1, "exact"))
        .unionByName(stat(s2, "near"))
        .unionByName(stat(s3, "containment"))
    )


ORACLE_DEDUP_FUNNEL = f"""
WITH s1 AS (
    SELECT d.doc_id, d.n_chars FROM documents d
    JOIN (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)) k
      ON d.doc_id = k.keep_id
),
near AS (SELECT doc_a, doc_b FROM ({ORACLE_MINHASH_LSH}) t),
s2 AS (
    SELECT * FROM s1 WHERE doc_id NOT IN (
        SELECT n.doc_b FROM near n JOIN s1 a ON n.doc_a = a.doc_id)
),
cont AS (SELECT contained_doc, container_doc
         FROM ({ORACLE_CONTAINMENT_PREFIX}) t),
s3 AS (
    SELECT * FROM s2 WHERE doc_id NOT IN (
        SELECT c.contained_doc FROM cont c JOIN s2 b ON c.container_doc = b.doc_id)
)
SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars FROM documents
UNION ALL SELECT 'exact', CAST(count(*) AS BIGINT),
       CAST(sum(n_chars) AS BIGINT) FROM s1
UNION ALL SELECT 'near', CAST(count(*) AS BIGINT),
       CAST(sum(n_chars) AS BIGINT) FROM s2
UNION ALL SELECT 'containment', CAST(count(*) AS BIGINT),
       CAST(sum(n_chars) AS BIGINT) FROM s3
"""


# Oracle for the streaming containment probe (streaming/jobs.py:
# stream_containment_probe): every doc probed against every OTHER doc's
# capped shingle set, |A∩B| / |A| for the PROBE side A — both directions,
# unlike the batch pair op's smaller-set orientation, because the probe
# question is "is this incoming doc inside any existing doc".
ORACLE_CONTAINMENT_PROBE = f"""{_DUCK_SHINGLES},
common AS (
    SELECT a.doc_id AS doc_id, b.doc_id AS container_doc, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
)
SELECT c.doc_id, c.container_doc, CAST(c.c AS DOUBLE) / x.n AS containment
FROM common c JOIN sizes x ON c.doc_id = x.doc_id
WHERE CAST(c.c AS DOUBLE) / x.n >= {CONTAINMENT_THRESHOLD}
"""


def dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DUPLICATION COVERAGE — the fraction of a doc's
    distinct shingles that occur in at least one OTHER doc (the
    RefinedWeb/Dolma-style "duplicated n-gram" dataset metric, the
    per-doc companion of the corpus-level funnel): documents scoring
    high here are boilerplate-heavy or templated even when no single
    pair crosses the near-dup threshold, so pipelines use this as a
    soft quality signal where pairwise dedup is the hard filter.
    Shingle df comes from one aggregation over the UNCAPPED shingle
    table (the cap exists to bound pair joins; a coverage count is a
    per-key aggregate and needs no cap); the x1000 integer ratio
    hash-pins. Two shuffles (df on shingle, rollup on doc)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    sh = raw_shingles(docs)
    with_df = sh.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("s"))
    )
    return (
        with_df.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("df") > 1, 1)).alias("n_dup_shingles"),
        )
        .withColumn(
            "dup_coverage_x1000",
            F.expr("(1000 * n_dup_shingles) DIV n_shingles").cast("long"),
        )
    )


ORACLE_DUP_NGRAM_COVERAGE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                       x -> x <> '') AS t
    FROM documents
),
sh_all AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, len(t) - {SHINGLE_K - 2}),
               i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))) AS s
    FROM toks
    WHERE len(t) >= {SHINGLE_K}
),
df AS (SELECT s, count(*) AS df FROM sh_all GROUP BY 1)
SELECT a.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(CASE WHEN df.df > 1 THEN 1 END) AS BIGINT) AS n_dup_shingles,
       (1000 * CAST(count(CASE WHEN df.df > 1 THEN 1 END) AS BIGINT))
         // count(*) AS dup_coverage_x1000
FROM sh_all a JOIN df USING (s)
GROUP BY 1
"""


# Banding configs over the SAME 16 chunk min-hashes (bands x rows = 16):
# the knob a pipeline owner turns to trade candidate volume (cost)
# against recall at the Jaccard threshold. P(candidate | J=s) =
# 1-(1-s^r)^b — more, narrower bands = higher recall AND more false
# candidates; the sweep measures both on the live corpus.
BAND_TUNING_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))


def minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BANDING CALIBRATION SWEEP — for each (bands, rows_per_band)
    layout of the same 16 min-hashes, the measured candidate-pair count,
    hit count against the exact-Jaccard truth (>= JACCARD_THRESHOLD),
    and recall/precision x1000 — the sim_ivf_nprobe_sweep discipline
    applied to the dedup family's own index knob. The production config
    (8, 2) is chosen from exactly this table, not from the collision
    formula alone.

    ONE signature pass feeds every config: the 16 chunk min-hashes are
    computed once (_band_sigs' sig_wide), each config re-stacks them
    into its own (band, sig) keys, and the union of all stacks goes
    through a SINGLE self-equi-join grouped by config — 4 configs cost
    one shuffle on (cfg, band, sig), not 4 plans. Truth pairs come from
    the exact shared-shingle Jaccard (complete for J > 0), computed once
    and semi-joined per config.

    Both shared subtrees are EAGERLY CHECKPOINTED: Spark does not reuse
    exchanges across multi-consumer subtrees (the round-6 lesson), and
    here sig_wide has 4 stack consumers and the shingle table 3 (the
    signature agg + both sides of the truth self-join). Measured at
    sf0.1/local[32]: 5.5 s steady / 18.5 s cold unchecked vs 3.1 s /
    3.9 s with both checkpoints. sig_wide is one row per doc — always
    safe; the shingle checkpoint is the bigger buffer, which is fine
    HERE because banding calibration is a sampled-corpus job by nature
    (the recall estimate needs thousands of docs, not 100 TB) — the
    full-corpus serving path stays minhash_lsh_pairs, which deliberately
    does NOT materialize (its docstring records that measurement)."""
    tune(spark)
    # spread the single-row-group scan so the checkpointed shingle build
    # parallelizes (guide §2.5; identity when splits >= cores)
    docs = spread_small_scan(load(spark, sf_dir, "documents"))
    sh = _shingles(docs).localCheckpoint(eager=True)
    sig_wide, _ = _band_sigs(sh)
    sig_wide = sig_wide.localCheckpoint(eager=True)
    stacks = []
    for nb, r in BAND_TUNING_CONFIGS:
        stack_args = ", ".join(
            f"{b}, concat({', '.join(f'm{b * r + i}' for i in range(r))})"
            for b in range(nb)
        )
        stacks.append(
            sig_wide.selectExpr(
                f"{nb}L AS bands",
                f"{r}L AS rows_per_band",
                "doc_id",
                f"stack({nb}, {stack_args}) AS (band, sig)",
            )
        )
    sig = stacks[0]
    for s in stacks[1:]:
        sig = sig.unionByName(s)
    cand = (
        sig.alias("a")
        .join(
            sig.alias("b"),
            (F.col("a.bands") == F.col("b.bands"))
            & (F.col("a.rows_per_band") == F.col("b.rows_per_band"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.bands").alias("bands"),
            F.col("a.rows_per_band").alias("rows_per_band"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    truth = _pair_jaccard(sh).select("doc_a", "doc_b")
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    # r16 (guide §2.4): cand was consumed TWICE — a bare count plus a
    # left-semi-join hit count, then re-joined — so the candidate
    # self-join + distinct subtree appeared twice in the plan (exchange
    # reuse dedupes the shuffle, not the per-consumer distinct/join
    # work above it). One LEFT join against the truth pairs (unique on
    # (doc_a, doc_b) by _pair_jaccard's groupBy) marks hits, and a
    # single aggregation produces both counts: count(hit) over the
    # preserved cand rows ≡ the old semi-join count, 0 for a config
    # with no hits ≡ the old coalesce.
    flagged = cand.join(
        truth.withColumn("hit", F.lit(1)), ["doc_a", "doc_b"], "left"
    )
    per_cfg = (
        flagged.groupBy("bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.count("hit").cast("long").alias("n_hit"),
        )
        .crossJoin(n_true)
    )
    return per_cfg.select(
        "bands",
        "rows_per_band",
        "n_candidates",
        "n_true",
        "n_hit",
        F.when(F.col("n_true") > 0, F.expr("(1000 * n_hit) DIV n_true"))
        .cast("long")
        .alias("recall_x1000"),
        F.when(
            F.col("n_candidates") > 0, F.expr("(1000 * n_hit) DIV n_candidates")
        )
        .cast("long")
        .alias("precision_x1000"),
    )


def _band_tuning_cfg_ctes() -> str:
    parts = []
    for nb, r in BAND_TUNING_CONFIGS:
        mins = " || ".join(
            f"min(substring(h, 1 + ({r}*b+{i})*{CHUNK_HEX}, {CHUNK_HEX}))"
            for i in range(r)
        )
        parts.append(
            f"""sig_{nb}_{r} AS (
    SELECT doc_id, b AS band, {mins} AS sig
    FROM hashed, (SELECT unnest(range(0, {nb})) AS b)
    GROUP BY 1, 2
),
cand_{nb}_{r} AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig_{nb}_{r} a JOIN sig_{nb}_{r} b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""
        )
    return ",\n".join(parts)


def _band_tuning_selects() -> str:
    sels = []
    for nb, r in BAND_TUNING_CONFIGS:
        sels.append(
            f"""SELECT CAST({nb} AS BIGINT) AS bands, CAST({r} AS BIGINT) AS rows_per_band,
       CAST((SELECT count(*) FROM cand_{nb}_{r}) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT count(*) FROM cand_{nb}_{r} c JOIN truth t USING (doc_a, doc_b)) AS BIGINT) AS n_hit"""
        )
    return "\nUNION ALL\n".join(sels)


ORACLE_MINHASH_BAND_TUNING = f"""{_DUCK_SHINGLES},
hashed AS (
    SELECT doc_id, s, md5(s) || md5('x' || s) AS h FROM sh
),
{_band_tuning_cfg_ctes()},
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
truth AS (
    SELECT doc_a, doc_b
    FROM common c JOIN sizes x ON c.doc_a = x.doc_id
    JOIN sizes y ON c.doc_b = y.doc_id
    WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}
),
cfgs AS (
{_band_tuning_selects()}
)
SELECT bands, rows_per_band, n_candidates, n_true, n_hit,
       CASE WHEN n_true > 0 THEN (1000 * n_hit) // n_true END AS recall_x1000,
       CASE WHEN n_candidates > 0 THEN (1000 * n_hit) // n_candidates END AS precision_x1000
FROM cfgs
"""


# Jaccard prefix-filter bound: J(A,B) >= t with |A| <= |B| implies
# overlap c >= ceil(alpha*|A|) where alpha = 2t/(1+t) (from
# c(1+t) >= t(|A|+|B|) >= 2t|A|), so the smaller side's safe probe
# prefix is |A| - ceil(alpha*|A|) + 1 canonical-first shingles. Also
# |B| <= |A|/t (c <= |A| forces it) — the PPJoin length filter. All
# bounds computed as exact rationals (the containment lesson: float
# floor/ceil is one off at every denominator multiple).
_JT = Fraction(JACCARD_THRESHOLD).limit_denominator(1000)
JP_ALPHA_NUM, JP_ALPHA_DEN = (2 * _JT / (1 + _JT)).as_integer_ratio()
JP_LEN_NUM, JP_LEN_DEN = _JT.as_integer_ratio()  # t = NUM/DEN; nb*NUM <= na*DEN


def jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard near-dup pairs via PPJoin-style prefix filtering
    (Bayardo et al. WWW'07) — the same result set as ngram_jaccard_pairs
    (it SHARES that entry's oracle verbatim; the equivalence of the two
    plans is the correctness contract), computed without joining every
    shared shingle: each doc probes only its first
    n - ceil(alpha*n) + 1 canonical shingles (alpha = 2t/(1+t)), the
    length filter |B| <= |A|/t prunes size-mismatched pairs the
    threshold already excludes, and exact Jaccard verifies candidates
    only.

    Scale shape vs the full shingle self-join: probe rows are ~(1-alpha)
    of the shingle table (25% at t=0.6), so the candidate join's left
    side shrinks 4x and the quadratic per-key fanout applies to the
    prefix subset only. Canonical order here is md5 (deterministic,
    engine-portable); production would order shingles by ascending
    document frequency, which concentrates prefixes on RARE shingles
    and cuts candidate volume further — the ordering is a pure
    optimization knob, correctness never depends on it. The DF cap
    (_shingles) stays, keeping this entry's universe identical to the
    Jaccard family's."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    w = Window.partitionBy("doc_id").orderBy("pk", "s")
    ranked = sh.withColumn("pk", F.md5("s")).select(
        "doc_id",
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n"),
    )
    c_min = F.expr(
        f"({JP_ALPHA_NUM}L * n + {JP_ALPHA_DEN - 1}L) div {JP_ALPHA_DEN}L"
    )
    prefix = ranked.filter(F.col("rn") <= F.col("n") - c_min + 1)
    idx = ranked.select(
        F.col("doc_id").alias("doc_b"), "s", F.col("n").alias("nb")
    )
    cand = (
        prefix.alias("p")
        .join(idx.alias("i"), "s")
        .filter(
            # probe side is the (n, doc_id)-lexicographically smaller set
            ((F.col("p.n") < F.col("nb"))
             | ((F.col("p.n") == F.col("nb")) & (F.col("p.doc_id") < F.col("doc_b"))))
            # PPJoin length filter: nb <= na/t, in integers
            & (F.col("nb") * JP_LEN_NUM <= F.col("p.n") * JP_LEN_DEN)
        )
        .select(
            # re-orient to doc-id order — the verify join and the shared
            # ngram oracle key pairs by doc_id, not by set size
            F.least(F.col("p.doc_id"), F.col("doc_b")).alias("doc_a"),
            F.greatest(F.col("p.doc_id"), F.col("doc_b")).alias("doc_b"),
        )
        .distinct()
    )
    return _pair_jaccard(sh, pairs=cand)


def apply_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-filtering form of CONTAINMENT dedup: drop every doc
    whose shingle set is >= t contained in some other doc (the
    truncation/excerpt-dup strip — apply_near_dedup's policy applied to
    the asymmetric family). The contained side of each pair is already
    oriented by containment_prefix_pairs ((n, doc_id) smaller), so the
    policy is one distinct + one anti-join over the pair list — the
    greedy single-pass form production pipelines use. A doc contained
    in a LARGER doc always drops; the larger container survives unless
    itself contained elsewhere."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    pairs = containment_prefix_pairs(spark, sf_dir)
    losers = pairs.select(F.col("contained_doc").alias("doc_id")).distinct()
    return (
        docs.join(losers, "doc_id", "left_anti")
        .select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
    )


ORACLE_APPLY_CONTAINMENT = f"""{_DUCK_SHINGLES},
common AS (
    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
losers AS (
    SELECT DISTINCT CASE WHEN (x.n, da) < (y.n, db) THEN da ELSE db END AS doc_id
    FROM common
    JOIN sizes x ON da = x.doc_id
    JOIN sizes y ON db = y.doc_id
    WHERE CAST(c AS DOUBLE) / least(x.n, y.n) >= {CONTAINMENT_THRESHOLD}
)
SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
WHERE l.doc_id IS NULL
"""


# --- Winnowing fingerprints (round 10) ---------------------------------------

WINNOW_W = 4  # winnowing window: guarantees any match of >= W+K-1 tokens
WINNOW_MIN_SHARED = 2  # pair report floor — one shared fingerprint is noise


def winnow_fingerprint_rows(docs: DataFrame) -> DataFrame:
    """Per-doc WINNOWED fingerprint rows (doc_id, fp) — the local
    document-fingerprinting algorithm of Schleimer/Wilkerson/Aiken,
    SIGMOD'03 (the MOSS scheme): hash every positional word-K-gram,
    slide a window of WINNOW_W consecutive hashes, keep each window's
    MINIMUM. Guarantee: any shared run of >= WINNOW_W + SHINGLE_K - 1
    tokens between two docs yields a shared fingerprint; expected
    density is 2/(W+1) — ~2.5x fewer index rows than the full shingle
    set at W=4, the whole point at 100 TB (the fingerprint index this
    feeds is the thing that must fit a shuffle).

    Shape: pure per-row array math (hash transform, window-min
    transform, distinct, explode) — zero aggregation, zero join — so it
    runs UNCHANGED on a streaming DataFrame (stream_winnowing twin).
    The k-gram hash array is materialized once per row (O(m) md5 calls)
    and the window-min transform + distinct live INSIDE the explode's
    Generate, keeping the fused plan shape raw_shingles documents.
    Hashes are md5 hex strings: lexicographic min is portable
    bit-for-bit to the DuckDB oracle."""
    return _kgram_hashes(docs).select(
        "doc_id",
        F.explode(F.expr(_winnow_fp_expr(WINNOW_W))).alias("fp"),
    )


# The k-gram hash term lists are BUILT from SHINGLE_K (advisor r10: a
# hardcoded t[i], t[i+1], t[i+2] next to a SHINGLE_K-derived sequence
# bound would silently desynchronize if the constant moved). Spark
# t[i] is 0-based with i from sequence(0, ...); DuckDB lists are
# 1-based with i from range(1, ...) — the +j offsets are shared.
_KGRAM_TERMS = ", ".join(f"t[i+{j}]" for j in range(SHINGLE_K))
_DUCK_KGRAM_TERMS = ", ' ', ".join(f"t[i+{j}]" for j in range(SHINGLE_K))


def _kgram_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, hs) — the positional word-K-gram md5 hash array
    winnowing slides over, materialized once per row (O(m) md5 calls);
    shared by the production-W fingerprint path and the W-sweep so the
    hash arithmetic cannot drift between them."""
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") >= SHINGLE_K
    )
    return toks.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, size(t) - {SHINGLE_K}),"
            f" i -> md5(concat_ws(' ', {_KGRAM_TERMS})))"
        ).alias("hs"),
    )


def _winnow_fp_expr(w: int) -> str:
    """The window-min fingerprint expression over ``hs`` for window
    width ``w`` — one SQL string so the consumer's explode stays FUSED
    over the computed array (the Generate-fusion lesson)."""
    return (
        "array_distinct(transform("
        f"sequence(1, greatest(1, size(hs) - {w} + 1)),"
        f" j -> array_min(slice(hs, j, {w}))))"
    )


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch entry over winnow_fingerprint_rows — the corpus fingerprint
    index (doc_id, fp) a plagiarism/overlap service serves from."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return winnow_fingerprint_rows(docs)


# toks/hashed are W-independent — their own constant so the single-W
# oracle and the W-sweep oracle COMPOSE from one definition (review
# r11: the sweep previously string-sliced the finished _DUCK_WINNOW)
_DUCK_WINNOW_BASE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                       x -> x <> '') AS t
    FROM documents
),
hashed AS (
    SELECT doc_id,
           list_transform(range(1, len(t) - {SHINGLE_K - 2}),
                          i -> md5(concat({_DUCK_KGRAM_TERMS}))) AS hs
    FROM toks WHERE len(t) >= {SHINGLE_K}
)"""

_DUCK_WINNOW = f"""{_DUCK_WINNOW_BASE},
fps AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(1, len(hs) - {WINNOW_W} + 1) + 1),
               j -> list_aggregate(hs[j : j + {WINNOW_W} - 1], 'min')))) AS fp
    FROM hashed
)"""

ORACLE_WINNOW_FINGERPRINTS = f"""{_DUCK_WINNOW}
SELECT doc_id, fp FROM fps
"""


def winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from shared winnowed fingerprints —
    overlap detection at fingerprint density (2/(W+1)) instead of full
    shingle density. Discipline mirrors the shingle family: a
    document-frequency cap (MAX_SHINGLE_DF) drops boilerplate
    fingerprints before the self-join so no shuffle key fans out
    quadratically; pairs report once ((doc_a < doc_b)) with the shared
    count, floored at WINNOW_MIN_SHARED. The bucketing contract is
    exact — the oracle applies the identical winnow + cap — so the
    entry is hash-checked, not best-effort."""
    tune(spark)
    # NO spread_small_scan — measured at sf0.1 (r16, interleaved):
    # 1.98 s spread vs 1.65 s unspread; one winnow width over one scan
    # is too light to amortize an injected repartition.
    docs = load(spark, sf_dir, "documents")
    # DF cap via the module's window idiom (_shingles FREQ_FILTER_STRATEGY
    # = "window"): one pass over the fingerprint rows instead of a
    # groupBy+join that would evaluate the md5 winnow subtree once more.
    fpr = (
        winnow_fingerprint_rows(docs)
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .select("doc_id", "fp")
    )
    a = fpr.alias("a")
    b = fpr.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= WINNOW_MIN_SHARED)
    )


ORACLE_WINNOW_PAIRS = f"""{_DUCK_WINNOW},
rare AS (
    SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {MAX_SHINGLE_DF}
),
fpr AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS shared
FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


def winnowing_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-measurement for the winnowing family (the lsh_recall_report
    discipline): of the TRUE near-dup pairs (exact n-gram Jaccard >=
    threshold — the all-pairs truth), how many does the winnowed
    fingerprint pair join recover? One hash-pinned integer ledger row
    (true_pairs / found_pairs / missed_pairs). Winnowing guarantees
    detection of shared RUNS >= WINNOW_W + SHINGLE_K - 1 tokens, which
    is a different notion than set-Jaccard — scattered shared shingles
    with no contiguous run CAN be missed, and this ledger prices that
    gap empirically so the W knob is tuned on numbers, not vibes. The
    truth side is audit-scale (or a sampled partition at 100 TB); the
    fingerprint side is the production path being audited."""
    tune(spark)
    return _recall_ledger(
        ngram_jaccard_pairs(spark, sf_dir), winnowing_pairs(spark, sf_dir)
    )


ORACLE_WINNOW_RECALL_REPORT = _oracle_recall_ledger(
    ORACLE_NGRAM_JACCARD, ORACLE_WINNOW_PAIRS
)


# Window widths swept over the SAME k-gram hash arrays (the production
# W=4 included): the knob a pipeline owner turns to trade fingerprint
# index density (~2/(W+1) of the shingle count) against the guaranteed
# detectable run length (W + K - 1 tokens) and the empirical recall
# against exact set-Jaccard truth.
WINNOW_W_SWEEP = (2, 4, 8, 16)


def winnowing_w_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING WINDOW CALIBRATION SWEEP (VERDICT r10 ask #3) — the
    minhash_band_tuning discipline applied to the winnowing family's own
    knob: for each W in WINNOW_W_SWEEP, the fingerprint index size, the
    candidate-pair volume after the DF cap + MIN_SHARED floor, and
    recall/precision x1000 against the exact n-gram Jaccard truth — so W
    is tuned on numbers, not on the 2/(W+1) density formula alone.

    ONE k-gram hash pass feeds every W: _kgram_hashes materializes the
    per-doc hash array once, and a SINGLE fused Generate explodes all
    four per-W fingerprint sets as (w, fp) structs — 4 window widths
    cost one corpus scan, not 4 plans. Shared-subtree checkpointing was
    MEASURED, not assumed (the band_tuning ask): eagerly checkpointing
    fps and capped is a steady-state WASH at sf0.1/local[32] (medians
    4.8 s checked vs 4.9 s unchecked, interleaved warm runs) — AQE
    exchange reuse covers these two multi-consumer subtrees, the
    minhash_lsh_pairs counter-lesson — so the plan stays declarative;
    don't re-add materialization here without a new measurement.
    The output joins from a literal W dimension so a W with zero
    candidates (or an empty corpus) still reports its row, mirroring
    the oracle's unconditional per-W selects."""
    tune(spark)
    # spread the single-row-group scan: the fused 4-width k-gram-md5
    # Generate above it was the sf1 ladder's serial wall (~20 s in one
    # task; guide §2.5; identity when splits >= cores)
    docs = spread_small_scan(load(spark, sf_dir, "documents"))
    per_w = ", ".join(
        f"transform({_winnow_fp_expr(w)},"
        f" f -> named_struct('w', CAST({w} AS BIGINT), 'fp', f))"
        for w in WINNOW_W_SWEEP
    )
    fps = (
        _kgram_hashes(docs)
        .select("doc_id", F.explode(F.expr(f"flatten(array({per_w}))")).alias("s"))
        .select("doc_id", "s.w", "s.fp")
    )
    n_fps = fps.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n_fps"))
    capped = (
        fps.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("w", "fp"))
        )
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .select("w", "doc_id", "fp")
    )
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.w").alias("w"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= WINNOW_MIN_SHARED)
        .select("w", "doc_a", "doc_b")
    )
    truth = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    # r16 (guide §2.4, the band_tuning fusion): pairs was consumed
    # twice (bare count + left-semi hit count), duplicating the whole
    # capped self-join subtree in the plan; one LEFT join against the
    # truth pairs (unique on (doc_a, doc_b) — a groupBy/HAVING output)
    # preserves the pairs row count and marks hits, so ONE aggregation
    # yields both counts per w.
    counts = (
        pairs.join(truth.withColumn("hit", F.lit(1)), ["doc_a", "doc_b"], "left")
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.count("hit").cast("long").alias("n_hit"),
        )
    )
    ws = spark.createDataFrame(
        [(w,) for w in WINNOW_W_SWEEP], "w bigint"
    )
    per = (
        ws.join(F.broadcast(n_fps), "w", "left")
        .join(F.broadcast(counts), "w", "left")
        .crossJoin(F.broadcast(n_true))
        .select(
            "w",
            F.coalesce("n_fps", F.lit(0)).cast("long").alias("n_fps"),
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.col("n_true").cast("long").alias("n_true"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    return per.select(
        "w",
        "n_fps",
        "n_candidates",
        "n_true",
        "n_hit",
        F.when(F.col("n_true") > 0, F.expr("(1000 * n_hit) DIV n_true"))
        .cast("long")
        .alias("recall_x1000"),
        F.when(
            F.col("n_candidates") > 0, F.expr("(1000 * n_hit) DIV n_candidates")
        )
        .cast("long")
        .alias("precision_x1000"),
    )


def _winnow_sweep_ctes() -> str:
    parts = []
    for w in WINNOW_W_SWEEP:
        parts.append(
            f"""fps_{w} AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(1, len(hs) - {w} + 1) + 1),
               j -> list_aggregate(hs[j : j + {w - 1}], 'min')))) AS fp
    FROM hashed
),
rare_{w} AS (SELECT fp FROM fps_{w} GROUP BY fp HAVING count(*) <= {MAX_SHINGLE_DF}),
fpr_{w} AS (SELECT f.doc_id, f.fp FROM fps_{w} f JOIN rare_{w} r ON f.fp = r.fp),
pairs_{w} AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM fpr_{w} a JOIN fpr_{w} b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {WINNOW_MIN_SHARED}
)"""
        )
    return ",\n".join(parts)


def _winnow_sweep_selects() -> str:
    sels = []
    for w in WINNOW_W_SWEEP:
        sels.append(
            f"""SELECT CAST({w} AS BIGINT) AS w,
       CAST((SELECT count(*) FROM fps_{w}) AS BIGINT) AS n_fps,
       CAST((SELECT count(*) FROM pairs_{w}) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT count(*) FROM pairs_{w} p JOIN truth t USING (doc_a, doc_b)) AS BIGINT) AS n_hit"""
        )
    return "\nUNION ALL\n".join(sels)


ORACLE_WINNOW_W_SWEEP = f"""{_DUCK_WINNOW_BASE},
{_winnow_sweep_ctes()},
truth AS (SELECT doc_a, doc_b FROM ({ORACLE_NGRAM_JACCARD}) t)
SELECT w, n_fps, n_candidates, n_true, n_hit,
       CAST(CASE WHEN n_true > 0 THEN (1000 * n_hit) // n_true END AS BIGINT)
           AS recall_x1000,
       CAST(CASE WHEN n_candidates > 0 THEN (1000 * n_hit) // n_candidates END
            AS BIGINT) AS precision_x1000
FROM (
{_winnow_sweep_selects()}
) t
"""


# --- exact-substring dedup (round 13) ----------------------------------------
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") deduplicate at EXACT SUBSTRING granularity: any ~50-token
# run shared verbatim between two documents is a duplicate span, even
# when the documents as wholes are nowhere near each other — the case
# winnowing/MinHash (document-level) and dup_ngram_coverage
# (shingle-level, no contiguity) both miss. The paper builds a corpus
# suffix array; the shuffle-native equivalent here is positional k-gram
# postings + diagonal run merging:
#   (doc, pos, gram) postings  --gram equi-join-->  (d1, d2, p1, p2)
#   matches; matches on the same DIAGONAL (p2 - p1) at consecutive p1
#   merge into maximal runs (the islands trick: p1 - row_number is
#   constant exactly on a consecutive stretch); a run of c consecutive
#   gram starts covers c + K - 1 tokens.
# Every stage is a keyed shuffle (gram, then (d1,d2,diag), then doc) —
# no all-pairs product anywhere. The hot-gram cap bounds the equi-join
# fan-out: a gram occurring g times corpus-wide contributes O(g²) match
# rows, so boilerplate-grade grams (the suffix-array method's stopword
# runs) are dropped at an occurrence cap — the same guard as
# MAX_SHINGLE_DF / MAX_POSTING_DF, applied as ONE count-over-window on
# the gram key whose exchange the self-join then reuses
# (FREQ_FILTER_STRATEGY "window" rationale above). A capped gram can at
# worst SPLIT a true run in two (both halves still reported if they
# clear MIN_RUN_TOKENS) — the audit report below measures what that
# costs against the shingle-level coverage signal.

RUN_K = 8  # gram width: runs are detected at >= RUN_K shared tokens
MIN_RUN_TOKENS = 16  # report runs of at least this many tokens
MAX_RUN_GRAM_DF = 50  # occurrence cap per gram (join fan-out guard)

_RUN_GRAM_EXPR = (
    f"transform(sequence(0, size(t) - {RUN_K}), i -> concat_ws(' ', "
    + ", ".join(f"t[i+{j}]" for j in range(RUN_K))
    + "))"
)


def raw_positional_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, gram) positional RUN_K-gram postings WITHOUT the
    occurrence cap — a pure map explode, so it runs unchanged on a
    STREAMING DataFrame (the raw_shingles discipline). The streaming
    probe uses this for the arriving side: cap parity is implied,
    because a match needs the STATIC side's posting rows and those only
    exist for under-cap grams — same-gram, same cap decision."""
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") >= RUN_K
    )
    return toks.select(
        "doc_id",
        F.posexplode(F.expr(_RUN_GRAM_EXPR)).alias("pos", "gram"),
    )


def positional_run_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, gram) positional RUN_K-gram postings, occurrence-
    capped — raw_positional_grams + one count-over-window on gram; the
    window's exchange is reused by the pair join, which is keyed on
    gram too."""
    return (
        raw_positional_grams(docs)
        .withColumn("gct", F.count(F.lit(1)).over(Window.partitionBy("gram")))
        .filter(F.col("gct") <= MAX_RUN_GRAM_DF)
        .drop("gct")
    )


def substring_gram_matches(
    a_grams: DataFrame,
    b_grams: DataFrame,
    hint_merge: bool = False,
    scope: str = "cross",
) -> DataFrame:
    """(d1, d2, diag, p1) gram-match rows between an A side and a B
    side — ONE definition shared by the batch self-join and the
    streaming probe (where B is the arriving stream and each unordered
    pair is still counted exactly once, because the arriving doc only
    pairs with lower-id static docs).

    scope selects which pairs count (VERDICT r14 ask #3 added the
    intra-document branch; default unchanged so every pre-existing
    caller keeps its hashes):
      - "cross": d1 < d2 — distinct-document pairs, each unordered pair
        once (the original semantics).
      - "intra": d1 == d2 AND p2 > p1 — the SAME document's self-join
        off the main diagonal; p2 > p1 keeps one of each symmetric
        (+diag, -diag) twin, so each repeated-occurrence pair counts
        once and the LATER occurrence is the b side (the cut side,
        consistent with the cross-doc keep-lowest-id policy: the
        earliest copy keeps the text).
      - "both": the union predicate, evaluated in the SAME single gram
        join — cross-doc and intra-doc runs from one exchange, no
        second pass over the postings (how the full-strip entry
        avoids paying the join twice).
    """
    a = a_grams.select(
        F.col("doc_id").alias("d1"), F.col("pos").alias("p1"), "gram"
    )
    b = b_grams.select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("p2"), "gram"
    )
    if hint_merge:
        # bulk serve: both sides read the SAME gram-bucketed table, so a
        # SortMergeJoin takes its partitioning from the file layout —
        # zero gram Exchange (the bucketed_phrase_serve discipline)
        a, b = a.hint("merge"), b.hint("merge")
    cross = F.col("d1") < F.col("d2")
    intra = (F.col("d1") == F.col("d2")) & (F.col("p2") > F.col("p1"))
    cond = {"cross": cross, "intra": intra, "both": cross | intra}[scope]
    return (
        a.join(b, "gram")
        .filter(cond)
        .select("d1", "d2", (F.col("p2") - F.col("p1")).alias("diag"), "p1")
    )


def runs_finish(matches: DataFrame) -> DataFrame:
    """Diagonal islands + min-run floor over the gram-match rows,
    shared VERBATIM by the batch entry and the streaming probe (the
    group-by/window cannot run in append mode, so the probe drains the
    bounded match rows and finishes batch-side — the phrase-serve
    discipline)."""
    w = Window.partitionBy("d1", "d2", "diag").orderBy("p1")
    isl = matches.withColumn("isl", F.col("p1") - F.row_number().over(w))
    return (
        isl.groupBy("d1", "d2", "diag", "isl")
        .agg(
            F.min("p1").cast("long").alias("a_start"),
            (F.count(F.lit(1)) + F.lit(RUN_K - 1)).cast("long").alias("run_tokens"),
        )
        .filter(F.col("run_tokens") >= MIN_RUN_TOKENS)
        .select(
            F.col("d1").alias("doc_a"),
            F.col("d2").alias("doc_b"),
            "a_start",
            (F.col("a_start") + F.col("diag")).cast("long").alias("b_start"),
            "run_tokens",
        )
    )


def substring_runs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, a_start, b_start, run_tokens): maximal shared
    token runs >= MIN_RUN_TOKENS between ordered doc pairs. One gram
    equi-join (self-join on the capped postings — the exchange on gram
    is planned once), one (d1, d2, diag) window + aggregation."""
    g = positional_run_grams(docs)
    return runs_finish(substring_gram_matches(g, g))


def exact_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch entry: every maximal >= MIN_RUN_TOKENS shared run in the
    corpus, as (doc_a, doc_b, a_start, b_start, run_tokens)."""
    tune(spark)
    return substring_runs(load(spark, sf_dir, "documents"))


_DUCK_RUN_T = (
    f"list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),"
    " x -> x <> '')"
)

_DUCK_RUN_GRAM = "concat_ws(' ', " + ", ".join(
    f"t[i+{j}]" for j in range(RUN_K)
) + ")"

_DUCK_RUNS_CTE = f"""
WITH est AS (
    SELECT doc_id, {_DUCK_RUN_T} AS t FROM documents
),
eg AS (
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, {_DUCK_RUN_GRAM} AS gram
    FROM est, UNNEST(range(1, len(t) - {RUN_K - 2})) AS u(i)
    WHERE len(t) >= {RUN_K}
),
ekept AS (
    SELECT doc_id, pos, gram FROM (
        SELECT *, count(*) OVER (PARTITION BY gram) AS gct FROM eg
    ) WHERE gct <= {MAX_RUN_GRAM_DF}
),
em AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           b.pos - a.pos AS diag, a.pos AS p1
    FROM ekept a JOIN ekept b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
er AS (
    SELECT d1, d2, diag, p1,
           p1 - row_number() OVER (PARTITION BY d1, d2, diag ORDER BY p1)
               AS isl
    FROM em
),
eruns AS (
    SELECT d1 AS doc_a, d2 AS doc_b,
           CAST(min(p1) AS BIGINT) AS a_start,
           CAST(min(p1) + diag AS BIGINT) AS b_start,
           CAST(count(*) + {RUN_K - 1} AS BIGINT) AS run_tokens
    FROM er GROUP BY d1, d2, diag, isl
    HAVING count(*) + {RUN_K - 1} >= {MIN_RUN_TOKENS}
)"""

ORACLE_EXACT_SUBSTRING_RUNS = f"""{_DUCK_RUNS_CTE}
SELECT doc_a, doc_b, a_start, b_start, run_tokens FROM eruns
"""


def merged_spans(spans: DataFrame) -> DataFrame:
    """(doc_id, isl, mst, men): DISTINCT (doc_id, st, en) spans merged
    into disjoint intervals — the prefix-max island walk, factored so
    the ledger and the span-stripping rewrite share ONE definition.
    Input MUST be distinct (see substring_ledger's determinism note:
    tied spans reorder between the flag scan and the cumulative-sum
    scan and split islands)."""
    w = Window.partitionBy("doc_id").orderBy("st", "en")
    prev_max = F.max("en").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "new_isl",
        F.when(prev_max.isNull() | (F.col("st") > prev_max), 1).otherwise(0),
    ).withColumn(
        "isl",
        F.sum("new_isl").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("doc_id", "isl").agg(
        F.min("st").alias("mst"), F.max("en").alias("men")
    )


def substring_ledger(docs: DataFrame) -> DataFrame:
    """Per-doc DUPLICATED-SPAN LEDGER: overlapping run spans from all
    partners merged into disjoint intervals (prefix-max islands: a span
    starting past the running max end opens a new interval), then
    n_spans / dup_tokens / coverage per document — the table an
    exact-substring dedup pass actually cuts from (Lee et al. drop the
    duplicated spans, not the documents). Shuffles: the runs stages,
    then one per-doc window + rollup."""
    runs = substring_runs(docs)
    # DISTINCT before the island walk, load-bearing for determinism: the
    # interval union ignores multiplicity anyway, and duplicate
    # (doc, st, en) rows (the same span found via two partners) are
    # PEERS under the (st, en) ordering — the new_isl flags are computed
    # in one window scan and cumulatively summed in a second, so a tie
    # order that differs between the scans pairs a row with the other
    # row's flag and splits one island in two (observed: DuckDB
    # multi-threaded sorts flip a fully-duplicated doc between 78 and
    # 156 dup_tokens run-to-run). Dedup makes the ordering total.
    spans = runs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("a_start").alias("st"),
        (F.col("a_start") + F.col("run_tokens") - 1).alias("en"),
    ).unionByName(
        runs.select(
            F.col("doc_b").alias("doc_id"),
            F.col("b_start").alias("st"),
            (F.col("b_start") + F.col("run_tokens") - 1).alias("en"),
        )
    ).distinct()
    per_doc = merged_spans(spans).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("men") - F.col("mst") + 1).cast("long").alias("dup_tokens"),
    )
    lens = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    return per_doc.join(lens, "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_tokens",
        "n_tokens",
        F.expr("(1000 * dup_tokens) DIV n_tokens")
        .cast("long")
        .alias("substr_coverage_x1000"),
    )


def exact_substring_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch entry over substring_ledger."""
    tune(spark)
    return substring_ledger(load(spark, sf_dir, "documents"))


_DUCK_LEDGER_CTE = f"""{_DUCK_RUNS_CTE},
espans AS (
    -- UNION (not ALL): distinct spans, mirroring the Spark side's
    -- determinism contract (see substring_ledger) — duplicate spans are
    -- peers under the (st, en) sort and flip the island walk between
    -- the two window scans under multi-threaded execution
    SELECT doc_a AS doc_id, a_start AS st,
           a_start + run_tokens - 1 AS en FROM eruns
    UNION
    SELECT doc_b, b_start, b_start + run_tokens - 1 FROM eruns
),
eflag AS (
    SELECT doc_id, st, en,
           CASE WHEN max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                OR st > max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) THEN 1 ELSE 0 END AS new_isl
    FROM espans
),
eisl AS (
    SELECT doc_id, st, en,
           sum(new_isl) OVER (
               PARTITION BY doc_id ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS isl
    FROM eflag
),
emerged AS (
    SELECT doc_id, isl, min(st) AS mst, max(en) AS men
    FROM eisl GROUP BY doc_id, isl
),
eper AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(men - mst + 1) AS BIGINT) AS dup_tokens
    FROM emerged GROUP BY doc_id
),
elens AS (
    SELECT doc_id, CAST(len({_DUCK_RUN_T}) AS BIGINT) AS n_tokens
    FROM documents
)"""

ORACLE_EXACT_SUBSTRING_LEDGER = f"""{_DUCK_LEDGER_CTE}
SELECT p.doc_id, p.n_spans, p.dup_tokens, l.n_tokens,
       CAST((1000 * p.dup_tokens) // l.n_tokens AS BIGINT)
           AS substr_coverage_x1000
FROM eper p JOIN elens l ON p.doc_id = l.doc_id
"""


AUDIT_FLAG_X1000 = 500  # "half the doc is duplicated" flag threshold


def substring_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW OVERLAP REPORT between the two duplication signals: the
    contiguity-blind shingle metric (dup_ngram_coverage) and the
    exact-run ledger — the audit twin that says what the run detector's
    gram cap and MIN_RUN floor cost against the softer signal. Columns:
    docs scored by each, docs flagged (>= 50 % coverage) by each, the
    overlap, and runs-flagged-but-not-shingle-flagged (a contiguous
    >= MIN_RUN_TOKENS run implies heavy shingle duplication, so this
    column near zero is the internal-consistency check; the reverse
    direction is the expected recall gap — scattered 3-gram duplication
    with no long contiguous run)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    ng = dup_ngram_coverage(spark, sf_dir).select(
        "doc_id", "dup_coverage_x1000"
    )
    led = substring_ledger(docs).select(
        "doc_id", "dup_tokens", "substr_coverage_x1000"
    )
    j = ng.join(led, "doc_id", "left_outer")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("dup_tokens").cast("long").alias("n_docs_with_runs"),
        F.count(
            F.when(F.col("dup_coverage_x1000") >= AUDIT_FLAG_X1000, 1)
        ).cast("long").alias("n_flagged_ngram"),
        F.count(
            F.when(F.col("substr_coverage_x1000") >= AUDIT_FLAG_X1000, 1)
        ).cast("long").alias("n_flagged_runs"),
        F.count(
            F.when(
                (F.col("dup_coverage_x1000") >= AUDIT_FLAG_X1000)
                & (F.col("substr_coverage_x1000") >= AUDIT_FLAG_X1000),
                1,
            )
        ).cast("long").alias("n_flagged_both"),
        F.count(
            F.when(
                (F.col("substr_coverage_x1000") >= AUDIT_FLAG_X1000)
                & (
                    F.col("dup_coverage_x1000").isNull()
                    | (F.col("dup_coverage_x1000") < AUDIT_FLAG_X1000)
                ),
                1,
            )
        ).cast("long").alias("n_runs_not_ngram"),
        F.coalesce(F.sum("dup_tokens"), F.lit(0)).cast("long").alias(
            "total_dup_tokens"
        ),
    )


ORACLE_SUBSTRING_COVERAGE_AUDIT = f"""{_DUCK_LEDGER_CTE},
eledger AS (
    SELECT p.doc_id, p.dup_tokens,
           CAST((1000 * p.dup_tokens) // l.n_tokens AS BIGINT)
               AS substr_coverage_x1000
    FROM eper p JOIN elens l ON p.doc_id = l.doc_id
),
engram AS (
    SELECT doc_id, dup_coverage_x1000
    FROM ({ORACLE_DUP_NGRAM_COVERAGE}) t
),
ejoined AS (
    SELECT n.doc_id, n.dup_coverage_x1000,
           e.dup_tokens, e.substr_coverage_x1000
    FROM engram n LEFT JOIN eledger e ON n.doc_id = e.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(dup_tokens) AS BIGINT) AS n_docs_with_runs,
       CAST(count(CASE WHEN dup_coverage_x1000 >= {AUDIT_FLAG_X1000}
                  THEN 1 END) AS BIGINT) AS n_flagged_ngram,
       CAST(count(CASE WHEN substr_coverage_x1000 >= {AUDIT_FLAG_X1000}
                  THEN 1 END) AS BIGINT) AS n_flagged_runs,
       CAST(count(CASE WHEN dup_coverage_x1000 >= {AUDIT_FLAG_X1000}
                   AND substr_coverage_x1000 >= {AUDIT_FLAG_X1000}
                  THEN 1 END) AS BIGINT) AS n_flagged_both,
       CAST(count(CASE WHEN substr_coverage_x1000 >= {AUDIT_FLAG_X1000}
                   AND (dup_coverage_x1000 IS NULL
                        OR dup_coverage_x1000 < {AUDIT_FLAG_X1000})
                  THEN 1 END) AS BIGINT) AS n_runs_not_ngram,
       CAST(coalesce(sum(dup_tokens), 0) AS BIGINT) AS total_dup_tokens
FROM ejoined
"""


def strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE CUT ITSELF — Lee et al.'s exact-substring dedup does not drop
    documents, it removes the duplicated spans keeping one copy; this is
    that rewrite as a corpus pass. Keep-first policy consistent with
    exact_dedup's min-id convention: every detected run (doc_a < doc_b)
    is cut from doc_b only, so the lowest-id holder of a span keeps it
    (chains resolve transitively: in a 3-way duplicate the two higher
    ids lose their copies). Per doc: b-side spans merged to disjoint
    intervals (merged_spans, shared with the ledger), collected into ONE
    small sorted array per doc (bounded by that doc's span count), then
    the cut is a slice-concatenation fold over the gaps BETWEEN the
    sorted disjoint cuts — O(tokens + spans) per row (the r13 shape,
    `filter(t, i -> NOT exists(cuts, ...))`, re-scanned the span list
    per token: O(tokens x spans) per ROW, the same quadratic straggler
    class as the r12 histogram, worst exactly on the long heavily-
    duplicated docs this operator exists to cut — VERDICT r13 `weak`).
    The corpus is never exploded, never shuffled beyond the runs stages
    and one per-doc span rollup; the rewrite is map-side after a left
    join against the tiny span table. Emits count columns plus md5(kept
    text) so the full rewritten string is hash-pinned without shipping
    it through the compare. Cross-document runs only: doc_a < doc_b in
    substring_runs, so verbatim repetition WITHIN one document is out of
    scope by design (text_repetition covers the intra-doc signal); the
    oracle mirrors the same scope."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    runs = substring_runs(docs)
    spans = runs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("b_start").alias("st"),
        (F.col("b_start") + F.col("run_tokens") - 1).alias("en"),
    ).distinct()
    span_arr = (
        merged_spans(spans)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("mst", "men"))
            ).alias("cuts")
        )
    )
    toks = docs.select("doc_id", tokens_col("text").alias("t"))
    return apply_span_cuts(toks.join(span_arr, "doc_id", "left_outer"))


def apply_span_cuts(j: DataFrame) -> DataFrame:
    """(doc_id, t, cuts) -> the rewrite counts + kept-text hash. cuts is
    sorted by mst and disjoint (merged_spans invariant), so the kept
    array is the concatenation of the inter-cut gap slices: gap i runs
    from boundary p_i (0, then each men+1) to boundary m_i (each mst,
    then n), so zip the two shifted boundary arrays, slice each gap out
    of t, and flatten — O(tokens + spans) per row, each kept token
    copied exactly twice (gap slice, flatten). NOT an aggregate() fold:
    `concat(acc, slice(...))` re-copies the accumulator every step,
    which is the same quadratic (sum of prefix lengths = O(n x s)) in
    disguise — measured 130 s on the 400k-token linearity fixture
    before this spelling. slice is 1-indexed; positions are 0-indexed;
    gap lengths are >= 0 by disjointness and slice(t, x, 0) is [] so
    empty head/tail gaps cost nothing. Kept as its own projection so
    the expression evaluates once (CollapseProject declines to inline
    non-cheap expressions referenced twice — the r13 textstats
    hazard)."""
    kept = (
        "CASE WHEN cuts IS NULL THEN t ELSE "
        "flatten(zip_with("
        " concat(array(0), transform(cuts, c -> CAST(c.men AS INT) + 1)),"
        " concat(transform(cuts, c -> CAST(c.mst AS INT)), array(size(t))),"
        " (p, m) -> slice(t, p + 1, m - p))) END"
    )
    return j.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.expr(kept).alias("_kept"),
    ).select(
        "doc_id",
        "n_tokens",
        F.size("_kept").cast("long").alias("kept_tokens"),
        (F.col("n_tokens") - F.size("_kept")).cast("long").alias("removed_tokens"),
        F.md5(F.concat_ws(" ", F.col("_kept"))).alias("kept_md5"),
    )


ORACLE_STRIP_DUP_SPANS = f"""{_DUCK_RUNS_CTE},
sspans AS (
    SELECT DISTINCT doc_b AS doc_id, b_start AS st,
           b_start + run_tokens - 1 AS en
    FROM eruns
),
sflag AS (
    SELECT doc_id, st, en,
           CASE WHEN max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                OR st > max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) THEN 1 ELSE 0 END AS new_isl
    FROM sspans
),
sisl AS (
    SELECT doc_id, st, en,
           sum(new_isl) OVER (
               PARTITION BY doc_id ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS isl
    FROM sflag
),
smerged AS (
    SELECT doc_id, isl, min(st) AS mst, max(en) AS men
    FROM sisl GROUP BY doc_id, isl
),
stok AS (
    SELECT doc_id, unnest(t) AS tok,
           generate_subscripts(t, 1) - 1 AS pos
    FROM est
),
scut AS (
    SELECT k.doc_id, k.tok, k.pos
    FROM stok k
    WHERE NOT EXISTS (
        SELECT 1 FROM smerged m
        WHERE m.doc_id = k.doc_id AND k.pos >= m.mst AND k.pos <= m.men
    )
),
skept AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS kept_tokens,
           md5(coalesce(string_agg(tok, ' ' ORDER BY pos), '')) AS kept_md5
    FROM scut GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(len(d.t) - coalesce(k.kept_tokens, 0) AS BIGINT)
           AS removed_tokens,
       coalesce(k.kept_md5, md5('')) AS kept_md5
FROM est d LEFT JOIN skept k ON d.doc_id = k.doc_id
"""

# --- intra-document exact-substring cutting (VERDICT r14 ask #3) ------------
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") cut EVERY duplicated substring occurrence beyond the first,
# including verbatim repetition INSIDE one document — the branch the
# cross-doc family (d1 < d2) scoped out by design. The intra branch is
# the same positional-gram self-join off the main diagonal: d1 == d2,
# p2 > p1, so each repeated-occurrence pair counts once, diag > 0, and
# runs_finish / merged_spans / apply_span_cuts apply UNCHANGED (the b
# side is the later occurrence = the cut side, mirroring the cross-doc
# keep-lowest-id policy). A period-p repeat matches at every multiple
# of p — many diagonals, one overlapping span union — so the merged
# interval walk, not the run table, is the cut's unit of truth.
# Reference scope note: the family docstrings cite the formulation
# (gmall has no text-dedup analog; this extends SURVEY §2's pipeline
# families).


def intra_substring_runs(docs: DataFrame) -> DataFrame:
    """(doc_a == doc_b, a_start, b_start, run_tokens): maximal
    >= MIN_RUN_TOKENS token runs repeated WITHIN single documents.
    Same capped postings, same gram equi-join exchange, same island
    finish as the cross-doc table — only the pair predicate differs."""
    g = positional_run_grams(docs)
    return runs_finish(substring_gram_matches(g, g, scope="intra"))


def _b_side_spans(runs: DataFrame) -> DataFrame:
    """(doc_id, st, en) DISTINCT cut-side spans of a runs table — the
    later/higher-id occurrence loses its copy. distinct() is the
    offset-dedup: a period-p repeat emits the same span region via
    diagonals p, 2p, ... and merged_spans' determinism contract
    requires distinct input (see substring_ledger)."""
    return runs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("b_start").alias("st"),
        (F.col("b_start") + F.col("run_tokens") - 1).alias("en"),
    ).distinct()


def intra_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc INTRA-DOCUMENT duplicated-span ledger: later-occurrence
    spans of within-document repeats merged to disjoint intervals, then
    n_spans / dup_tokens / coverage — the intra twin of
    exact_substring_ledger (one row per doc that repeats itself; a
    period-2 pathological doc reports everything past the first period
    as duplicated). Shuffles: the shared runs stages + one per-doc
    window + rollup.

    Evidence note: the synthetic documents tables contain ZERO
    intra-document RUN_K-gram repeats (verified by direct DuckDB scan
    at sf0.01), so the driver's oracle row for this entry is an honest
    but vacuous 0 == 0; the operative correctness evidence is
    tests/test_intra_spans.py, which runs BOTH engines over a
    pathological fixture (period-2 repeat, disjoint block repeat,
    cross-doc control) and pins hand-computed expectations."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    per_doc = (
        merged_spans(_b_side_spans(intra_substring_runs(docs)))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.col("men") - F.col("mst") + 1)
            .cast("long")
            .alias("dup_tokens"),
        )
    )
    lens = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    return per_doc.join(lens, "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_tokens",
        "n_tokens",
        F.expr("(1000 * dup_tokens) DIV n_tokens")
        .cast("long")
        .alias("intra_coverage_x1000"),
    )


def strip_all_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE FULL CUT — strip_dup_spans' corpus rewrite with BOTH branches
    of the Lee et al. formulation: cross-document runs (cut from the
    higher doc_id) AND intra-document runs (cut from the later
    occurrence), as one pass. The two branches come from ONE gram join
    (scope="both" folds the union predicate into the same exchange —
    the postings are never joined twice), their (d1, d2, diag)
    partitions are disjoint, so the run table is exactly the union of
    the two scopes' runs; the b-side spans union under distinct() and
    the shared merged_spans / apply_span_cuts finish is unchanged.
    Same output shape as strip_dup_spans (n/kept/removed tokens +
    kept-text md5), so the two entries diff directly: any doc whose
    kept_md5 differs is a doc with intra-document repetition."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    g = positional_run_grams(docs)
    runs = runs_finish(substring_gram_matches(g, g, scope="both"))
    span_arr = (
        merged_spans(_b_side_spans(runs))
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("mst", "men"))).alias("cuts")
        )
    )
    toks = docs.select("doc_id", tokens_col("text").alias("t"))
    return apply_span_cuts(toks.join(span_arr, "doc_id", "left_outer"))


# Shared intra-match CTE chain (mirrors em/er/eruns with the
# off-diagonal self-pair predicate).
_DUCK_INTRA_RUNS = f"""
im AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           b.pos - a.pos AS diag, a.pos AS p1
    FROM ekept a JOIN ekept b
      ON a.gram = b.gram AND a.doc_id = b.doc_id AND b.pos > a.pos
),
ir AS (
    SELECT d1, d2, diag, p1,
           p1 - row_number() OVER (PARTITION BY d1, d2, diag ORDER BY p1)
               AS isl
    FROM im
),
iruns AS (
    SELECT d1 AS doc_a, d2 AS doc_b,
           CAST(min(p1) AS BIGINT) AS a_start,
           CAST(min(p1) + diag AS BIGINT) AS b_start,
           CAST(count(*) + {RUN_K - 1} AS BIGINT) AS run_tokens
    FROM ir GROUP BY d1, d2, diag, isl
    HAVING count(*) + {RUN_K - 1} >= {MIN_RUN_TOKENS}
)"""

ORACLE_INTRA_DOC_SPANS = f"""{_DUCK_RUNS_CTE},{_DUCK_INTRA_RUNS},
ispans AS (
    SELECT DISTINCT doc_b AS doc_id, b_start AS st,
           b_start + run_tokens - 1 AS en
    FROM iruns
),
iflag AS (
    SELECT doc_id, st, en,
           CASE WHEN max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                OR st > max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) THEN 1 ELSE 0 END AS new_isl
    FROM ispans
),
iisl AS (
    SELECT doc_id, st, en,
           sum(new_isl) OVER (
               PARTITION BY doc_id ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS isl
    FROM iflag
),
imerged AS (
    SELECT doc_id, isl, min(st) AS mst, max(en) AS men
    FROM iisl GROUP BY doc_id, isl
),
iper AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(men - mst + 1) AS BIGINT) AS dup_tokens
    FROM imerged GROUP BY doc_id
)
SELECT p.doc_id, p.n_spans, p.dup_tokens,
       CAST(len(d.t) AS BIGINT) AS n_tokens,
       CAST((1000 * p.dup_tokens) // len(d.t) AS BIGINT)
           AS intra_coverage_x1000
FROM iper p JOIN est d ON p.doc_id = d.doc_id
"""

ORACLE_STRIP_ALL_SPANS = f"""{_DUCK_RUNS_CTE},{_DUCK_INTRA_RUNS},
fspans AS (
    SELECT DISTINCT doc_b AS doc_id, b_start AS st,
           b_start + run_tokens - 1 AS en
    FROM (SELECT doc_b, b_start, run_tokens FROM eruns
          UNION ALL
          SELECT doc_b, b_start, run_tokens FROM iruns)
),
fflag AS (
    SELECT doc_id, st, en,
           CASE WHEN max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                OR st > max(en) OVER (
                    PARTITION BY doc_id ORDER BY st, en
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) THEN 1 ELSE 0 END AS new_isl
    FROM fspans
),
fisl AS (
    SELECT doc_id, st, en,
           sum(new_isl) OVER (
               PARTITION BY doc_id ORDER BY st, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS isl
    FROM fflag
),
fmerged AS (
    SELECT doc_id, isl, min(st) AS mst, max(en) AS men
    FROM fisl GROUP BY doc_id, isl
),
ftok AS (
    SELECT doc_id, unnest(t) AS tok,
           generate_subscripts(t, 1) - 1 AS pos
    FROM est
),
fcut AS (
    SELECT k.doc_id, k.tok, k.pos
    FROM ftok k
    WHERE NOT EXISTS (
        SELECT 1 FROM fmerged m
        WHERE m.doc_id = k.doc_id AND k.pos >= m.mst AND k.pos <= m.men
    )
),
fkept AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS kept_tokens,
           md5(coalesce(string_agg(tok, ' ' ORDER BY pos), '')) AS kept_md5
    FROM fcut GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(len(d.t) - coalesce(k.kept_tokens, 0) AS BIGINT)
           AS removed_tokens,
       coalesce(k.kept_md5, md5('')) AS kept_md5
FROM est d LEFT JOIN fkept k ON d.doc_id = k.doc_id
"""
