"""Similarity search over embedding columns (``array<float>``).

- ``ann_topk`` — brute-force cosine top-k: the exactness baseline. The
  per-pair dot product is a strictly sequential JVM-side fold
  (``aggregate(zip_with(...))``); the DuckDB oracle reproduces the *same
  addition sequence* (``list_reduce``), so the doubles are bit-identical
  in both engines and threshold/ranking decisions cannot diverge.
- ``embedding_neardup_lsh`` — the scale path: random-hyperplane-style LSH
  using the sign bits of the leading dimensions as the bucket key, then
  exact cosine verification *within* buckets. Candidate generation is an
  equi-join on the bucket key (shuffle-friendly, no all-pairs); at 100 TB
  the bucket width (SIGN_BITS) trades recall for join fan-out.

- Product quantization (``pq_encode`` / ``pq_adc_topk`` / ``ivfpq_topk``)
  is the compressed-corpus path: map-only encode against a broadcast
  codebook, LUT-join ADC scoring with DECIMAL-exact sums, and the
  combined IVF+PQ serving stack; ``ann_recall_report`` pins all
  approximate paths against the brute-force truth as a hash contract.
- k-means training (``_lloyd_rounds``) feeds the train→serve twins
  (``ivf_topk_trained``, ``semantic_dedup_trained``).

Similarities in output are rounded to 6dp — inputs are bit-identical (see
above) so the rounding is only cosmetic, not a parity crutch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_gmall_spark.session import tune
from flink_gmall_spark.sources import load

TOPK = 10
N_QUERIES = 8  # vec_id < 8 are the query vectors
SIGN_BITS = 8
COSINE_THRESHOLD = 0.40
N_CELLS = 16  # IVF: vectors vec_id < 16 serve as deterministic centroids
NPROBE = 4  # IVF: query probes its 4 nearest cells


def _with_norm(emb: DataFrame) -> DataFrame:
    """Double-cast vector + its L2 norm (sequential fold, see module doc)."""
    return emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias("v"),
    ).withColumn(
        "nrm",
        F.expr(
            "sqrt(aggregate(transform(v, x -> x * x), cast(0.0 AS double), (acc, x) -> acc + x))"
        ),
    )


_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)"
)

# DuckDB mirror: same multiply order, same left-fold addition sequence.
_DUCK_NORM = (
    "sqrt(list_reduce(list_transform({v}, x -> x * x), (acc, x) -> acc + x))"
)
_DUCK_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),"
    " (acc, x) -> acc + x)"
)


def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors for the query vectors.

    The query side is tiny (N_QUERIES rows) and broadcast; the corpus scan
    streams once. Ranking is windowed row_number with a vec_id tiebreak.
    """
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = F.broadcast(q).join(emb, F.col("query_id") != F.col("vec_id"))
    scored = pairs.withColumn(
        "cos", F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("sim"),
        )
    )


# Shared CTE chain for the brute-force cosine ranking — composed into
# ORACLE_ANN_TOPK here and into retrieval.ORACLE_HYBRID_RRF (one
# definition, so the fusion oracle cannot drift from the real ann_topk
# its Spark twin calls).
DUCK_ANN_RANKED_CTES = f"""e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
ann_scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a='q.v', b='e.v')} / (q.nrm * e.nrm) AS cos
    FROM e q JOIN e ON q.vec_id < {N_QUERIES} AND q.vec_id <> e.vec_id
),
ann_ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM ann_scored
)"""

ORACLE_ANN_TOPK = f"""
WITH {DUCK_ANN_RANKED_CTES}
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS sim
FROM ann_ranked WHERE rank <= {TOPK}
"""


def _cell_ranked(emb: DataFrame) -> DataFrame:
    """Per-vector centroid affinity ranking (crank 1 = assigned cell) —
    the broadcast-centroid assignment pass shared by the probe-candidate
    generator and the cell-balance ledger, so index assignment and its
    health report cannot drift."""
    cent = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    affinity = emb.join(F.broadcast(cent), how="cross").withColumn(
        "ccos", F.expr(_DOT.format(a="v", b="cv")) / (F.col("nrm") * F.col("cn"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    return affinity.withColumn("crank", F.row_number().over(w_assign))


def _ivf_probe_candidates(emb: DataFrame) -> DataFrame:
    """(query_id, vec_id) candidate pairs from the IVF probe plan.

    Assign every vector to its nearest of the N_CELLS broadcast
    centroids (crank = 1); each query probes its NPROBE nearest cells;
    candidates are the members of the probed cells, self excluded.
    Every join is an equi-join on the cell id — the corpus is touched
    by one streaming assignment pass plus one bucket join, never an
    all-pairs or per-query scan. Shared by ivf_topk (exact ranking over
    the candidates) and hard_negatives_ivf (threshold + ranking), so
    the probe semantics cannot drift between the serving and the mining
    path.
    """
    ranked = _cell_ranked(emb)
    cells = ranked.filter(F.col("crank") == 1).select("vec_id", "cid")
    probes = (
        ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("crank") <= NPROBE))
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    # probes is N_QUERIES x NPROBE rows — broadcast it against the
    # corpus-sized cells side so the bucket join never sort-merges
    return (
        F.broadcast(probes).join(cells, "cid")
        .select("query_id", "vec_id")
        .filter(F.col("query_id") != F.col("vec_id"))
    )


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest
    centroid cell; queries probe only their NPROBE nearest cells and rank
    exactly within them.

    The 100 TB shape: the centroid set is tiny and broadcast, cell
    assignment is one streaming pass (no shuffle of the corpus beyond the
    final per-cell grouping), and query cost is corpus_size * nprobe /
    n_cells. Centroids here are the first N_CELLS vectors — a
    deterministic stand-in for a k-means codebook (training is an offline
    job; the serving plan is what this operator exercises). Recall is
    partial by construction; the oracle applies identical probing.
    """
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = _ivf_probe_candidates(emb).join(qv, "query_id").join(emb, "vec_id")
    scored = cand.withColumn(
        "cos", F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("sim"),
        )
    )


# Shared CTE chain ending in `scored` (query_id, neighbor_id, cos over the
# IVF probe candidates) — the SQL twin of _ivf_probe_candidates, defined
# ONCE so ORACLE_IVF_TOPK and ORACLE_HARD_NEGATIVES_IVF cannot drift.
_DUCK_IVF_SCORED_CTES = f"""
e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e WHERE vec_id < {N_CELLS}),
affinity AS (
    SELECT e.vec_id, cent.cid,
           {_DUCK_DOT.format(a='e.v', b='cent.cv')} / (e.nrm * cent.cn) AS ccos
    FROM e CROSS JOIN cent
),
ranked AS (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crank
    FROM affinity
),
cells AS (SELECT vec_id, cid FROM ranked WHERE crank = 1),
probes AS (
    SELECT vec_id AS query_id, cid FROM ranked
    WHERE vec_id < {N_QUERIES} AND crank <= {NPROBE}
),
cand AS (
    SELECT DISTINCT p.query_id, c.vec_id
    FROM probes p JOIN cells c ON p.cid = c.cid
    WHERE p.query_id <> c.vec_id
),
scored AS (
    SELECT cand.query_id, cand.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a='q.v', b='n.v')} / (q.nrm * n.nrm) AS cos
    FROM cand
    JOIN e q ON cand.query_id = q.vec_id
    JOIN e n ON cand.vec_id = n.vec_id
)"""

ORACLE_IVF_TOPK = f"""
WITH {_DUCK_IVF_SCORED_CTES},
final AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS sim
FROM final WHERE rank <= {TOPK}
"""


def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive / retrieval training — per
    query (anchor), the TOPK most-similar corpus vectors whose cosine is
    BELOW the near-duplicate ceiling (COSINE_THRESHOLD, the same
    boundary semantic_dedup treats as "same content"): similar enough to
    be informative negatives, not so similar they are secretly positives
    — the mining step behind every dense-retriever / embedding-model
    training set (in-batch negatives are too easy; duplicates as
    negatives poison the loss). ``n_excluded`` rides along per query:
    how many candidates the near-dup ceiling rejected — the
    self-measurement column that proves the exclusion actually bit on
    this corpus (it is non-zero here by fixture construction).

    Scale shape: ann_topk's — tiny broadcast query side, per-query TopK
    via WindowGroupLimit, threshold filter pruning BEFORE ranking. The
    exclusion ledger is a second scan+partial-agg pass over the scored
    pairs (plan-gated: both passes broadcast the query side, nothing
    shuffles the corpus); the recall-report entries set the same
    two-pass precedent. At 100 TB the candidate generation swaps to the
    IVF probe plan (ivf_topk) unchanged; thresholds compare exactly
    because both engines fold the identical double sequence (module
    doc).
    """
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = F.broadcast(q).join(emb, F.col("query_id") != F.col("vec_id"))
    scored = pairs.withColumn(
        "cos", F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm"))
    )
    excluded = (
        scored.filter(F.col("cos") >= COSINE_THRESHOLD)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_excluded"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    negs = (
        scored.filter(F.col("cos") < COSINE_THRESHOLD)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
    )
    return negs.join(F.broadcast(excluded), "query_id", "left").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "rank",
        F.round("cos", 6).alias("sim"),
        F.coalesce("n_excluded", F.lit(0)).cast("long").alias("n_excluded"),
    )


ORACLE_HARD_NEGATIVES = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a='q.v', b='e.v')} / (q.nrm * e.nrm) AS cos
    FROM e q JOIN e ON q.vec_id < {N_QUERIES} AND q.vec_id <> e.vec_id
),
excluded AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_excluded
    FROM scored WHERE cos >= {COSINE_THRESHOLD} GROUP BY 1
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored WHERE cos < {COSINE_THRESHOLD}
)
SELECT r.query_id, r.neighbor_id, CAST(r.rank AS BIGINT) AS rank,
       round(r.cos, 6) AS sim,
       COALESCE(x.n_excluded, 0) AS n_excluded
FROM ranked r LEFT JOIN excluded x ON r.query_id = x.query_id
WHERE r.rank <= {TOPK}
"""


HN_EXACT_SAMPLE_SEED = "hn-exact:"  # md5 domain-separation for the audit sample


def audit_sampled(seed: str, exact_sample_hex: str) -> Column:
    """THE audit-sampling predicate over query_id — deterministic
    Bernoulli at rate int(hex,16)/16^6 via md5-prefix < 6-hex threshold,
    domain-separated by the family's seed. One definition (review r11)
    shared by the hard-negatives and range-search audit dials so the
    sampling convention cannot drift between families;
    _duck_audit_sampled is its oracle twin."""
    return (
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col("query_id").cast("string"))),
            1,
            6,
        )
        < F.lit(exact_sample_hex)
    )


def _duck_audit_sampled(seed: str, exact_sample_hex: str, q: str) -> str:
    """DuckDB twin of audit_sampled; ``q`` is the query_id SQL
    expression (may be a '{q}' placeholder for later .format)."""
    return (
        f"substring(md5('{seed}' || CAST({q} AS VARCHAR)), 1, 6)"
        f" < '{exact_sample_hex}'"
    )


def hard_negatives_ivf(
    spark: SparkSession, sf_dir: str, exact_sample_hex: str | None = None
) -> DataFrame:
    """hard_negatives served from the IVF PROBE candidate set — the
    100 TB path the brute-force entry's docstring names (VERDICT r8 ask
    #2). Candidate generation is _ivf_probe_candidates — the exact plan
    ivf_topk serves from: broadcast centroid assignment + equi-join on
    the probed cell ids — so mining cost is corpus_size * nprobe /
    n_cells per query instead of a linear corpus scan per query. The
    near-dup ceiling, the ``n_excluded`` ledger (counted over the probe
    candidates — what this index could have mistakenly served), and the
    (cos DESC, vec_id ASC) ranking are identical to the brute-force
    entry.

    ``hits_exact`` is the per-query recall ledger against the
    brute-force truth (ann_recall_report precedent): of this query's
    IVF-mined negatives, how many appear in hard_negatives' exact TOPK.
    Pinned as a hash contract — a probe regression (bad centroids,
    broken cell join) fails correctness, not just a quality dashboard.

    ``exact_sample_hex`` (VERDICT r9 ask #4) bounds the brute-force
    audit side when the query set grows: when set to a 6-hex-digit
    threshold (the curation_sample_* discipline — md5-prefix < hex ==
    deterministic Bernoulli at rate int(hex,16)/16^6), the exact top-k
    is computed ONLY for the sampled query ids (the query_id filter
    pushes through hard_negatives' window into its broadcast query-side
    scan, so the brute-force join really shrinks), and unsampled
    queries report ``hits_exact = -1`` ("not audited") instead of a
    fake 0. The default (None) keeps the full-set behavior — the
    registry/oracle hash contract is unchanged.
    """
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        _ivf_probe_candidates(emb)
        .join(F.broadcast(qv), "query_id")
        .join(emb, "vec_id")
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm")),
        )
    )
    excluded = (
        scored.filter(F.col("cos") >= COSINE_THRESHOLD)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_excluded"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    negs = (
        scored.filter(F.col("cos") < COSINE_THRESHOLD)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("sim"),
        )
    )
    exact_base = hard_negatives(spark, sf_dir)
    if exact_sample_hex is not None:
        audited = audit_sampled(HN_EXACT_SAMPLE_SEED, exact_sample_hex)
        exact_base = exact_base.filter(audited)
    exact = exact_base.select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    hits = (
        negs.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").cast("long").alias("hits_exact"))
    )
    hits_out = F.coalesce("hits_exact", F.lit(0)).cast("long")
    if exact_sample_hex is not None:
        hits_out = F.when(audited, hits_out).otherwise(F.lit(-1).cast("long"))
    return (
        negs.join(F.broadcast(excluded), "query_id", "left")
        .join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "sim",
            F.coalesce("n_excluded", F.lit(0)).cast("long").alias("n_excluded"),
            hits_out.alias("hits_exact"),
        )
    )


ORACLE_HARD_NEGATIVES_IVF = f"""
WITH {_DUCK_IVF_SCORED_CTES},
excluded AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_excluded
    FROM scored WHERE cos >= {COSINE_THRESHOLD} GROUP BY 1
),
ranked_neg AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored WHERE cos < {COSINE_THRESHOLD}
),
ivf_negs AS (SELECT * FROM ranked_neg WHERE rank <= {TOPK}),
exact_negs AS (
    SELECT query_id, neighbor_id FROM ({ORACLE_HARD_NEGATIVES}) t
),
hits AS (
    SELECT i.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits_exact
    FROM ivf_negs i
    LEFT JOIN exact_negs x
      ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
    GROUP BY 1
)
SELECT i.query_id, i.neighbor_id, CAST(i.rank AS BIGINT) AS rank,
       round(i.cos, 6) AS sim,
       COALESCE(xc.n_excluded, 0) AS n_excluded,
       COALESCE(h.hits_exact, 0) AS hits_exact
FROM ivf_negs i
LEFT JOIN excluded xc ON i.query_id = xc.query_id
LEFT JOIN hits h ON i.query_id = h.query_id
"""


HN_SAMPLE_HEX = "800000"  # registered sampled-audit entry: ~0.5 query rate


def hard_negatives_ivf_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAMPLED-audit serving shape of hard_negatives_ivf, pinned as
    its own driver hash contract (VERDICT r9 ask #4 upgraded from a
    unit test): the mined negatives are the full IVF result, but the
    brute-force recall ledger runs only over the deterministic
    md5-threshold query sample (HN_SAMPLE_HEX), with unsampled queries
    carrying the -1 "not audited" sentinel. This is the plan a real
    query volume runs — the full-audit twin stays as the fixture-scale
    contract."""
    return hard_negatives_ivf(spark, sf_dir, exact_sample_hex=HN_SAMPLE_HEX)


_DUCK_HN_AUDITED = _duck_audit_sampled(HN_EXACT_SAMPLE_SEED, HN_SAMPLE_HEX, "{q}")

ORACLE_HARD_NEGATIVES_IVF_SAMPLED = f"""
WITH {_DUCK_IVF_SCORED_CTES},
excluded AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_excluded
    FROM scored WHERE cos >= {COSINE_THRESHOLD} GROUP BY 1
),
ranked_neg AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored WHERE cos < {COSINE_THRESHOLD}
),
ivf_negs AS (SELECT * FROM ranked_neg WHERE rank <= {TOPK}),
exact_negs AS (
    SELECT query_id, neighbor_id FROM ({ORACLE_HARD_NEGATIVES}) t
    WHERE {_DUCK_HN_AUDITED.format(q='query_id')}
),
hits AS (
    SELECT i.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits_exact
    FROM ivf_negs i
    LEFT JOIN exact_negs x
      ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
    GROUP BY 1
)
SELECT i.query_id, i.neighbor_id, CAST(i.rank AS BIGINT) AS rank,
       round(i.cos, 6) AS sim,
       COALESCE(xc.n_excluded, 0) AS n_excluded,
       CASE WHEN {_DUCK_HN_AUDITED.format(q='i.query_id')}
            THEN COALESCE(h.hits_exact, 0)
            ELSE CAST(-1 AS BIGINT) END AS hits_exact
FROM ivf_negs i
LEFT JOIN excluded xc ON i.query_id = xc.query_id
LEFT JOIN hits h ON i.query_id = h.query_id
"""


def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-bit LSH buckets.

    Bucket key = sign pattern of the first SIGN_BITS dimensions (each sign
    bit is an independent hyperplane hash for cosine similarity); exact
    cosine verifies within buckets. Pairs split across buckets are missed
    by construction — the documented LSH recall trade; the oracle applies
    the identical bucketing so the contract is exact.
    """
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    bucket = F.concat_ws(
        "",
        *[
            F.when(F.element_at("v", i + 1) >= 0, "1").otherwise("0")
            for i in range(SIGN_BITS)
        ],
    )
    e = emb.withColumn("bucket", bucket)
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).withColumn(
        "cos",
        F.expr(_DOT.format(a="a.v", b="b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
    )
    return pairs.filter(F.col("cos") >= COSINE_THRESHOLD).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round("cos", 6).alias("sim"),
    )


_DUCK_BUCKET = " || ".join(
    f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(SIGN_BITS)
)

ORACLE_EMBEDDING_NEARDUP = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
b AS (
    SELECT vec_id, v, nrm, {_DUCK_BUCKET} AS bucket FROM e
),
pairs AS (
    SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
           {_DUCK_DOT.format(a='a.v', b='b2.v')} / (a.nrm * b2.nrm) AS cos
    FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
)
SELECT vec_a, vec_b, round(cos, 6) AS sim
FROM pairs WHERE cos >= {COSINE_THRESHOLD}
"""


N_BLOCK_QUERIES = 32


def block_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k via blocked numpy GEMM (mapInPandas).

    The Arrow/vectorized-Python path for the same contract as ann_topk:
    the (tiny) query matrix rides into every executor inside the UDF
    closure — the pandas-UDF equivalent of a broadcast join — and each
    Arrow batch of corpus vectors is scored with ONE dense matmul
    (Q @ M.T), then reduced to a local top-K per query before anything
    shuffles. The global window re-ranks the tiny union of local winners.
    At 100 TB this is the canonical shape: compute stays in BLAS, shuffle
    volume is O(partitions x queries x k), and the corpus is scanned
    exactly once.

    Exactness: local selection uses the SAME total order as the global
    window — (round(cos, 6) desc, neighbor_id asc) — so the global top-K
    is provably a subset of the union of local top-Ks; no probabilistic
    tie margin. GEMM sums in a different order than the sequential fold
    the rest of this module uses, so ranking and output use round(cos, 6)
    — agreement at 6dp is guaranteed by the ~1e-13 relative error bound
    of 64-term float64 dot products.
    """
    import numpy as np
    import pandas as pd

    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    qrows = (
        emb.filter(F.col("vec_id") < N_BLOCK_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )  # bounded: N_BLOCK_QUERIES rows — the "broadcast small side"
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mn = np.sqrt((M * M).sum(axis=1))
            cos = (Q @ M.T) / (qn[:, None] * mn[None, :])
            # self-matches masked; select on ROUNDED sim with neighbor_id
            # tiebreak — identical to the global window's total order
            cos[qids[:, None] == ids[None, :]] = -np.inf
            sim = np.round(cos, 6)
            take = min(TOPK, sim.shape[1])
            sel_ids = np.empty((len(qids), take), dtype=np.int64)
            sel_sim = np.empty((len(qids), take), dtype=np.float64)
            for qi in range(len(qids)):
                order = np.lexsort((ids, -sim[qi]))[:take]
                sel_ids[qi] = ids[order]
                sel_sim[qi] = sim[qi][order]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, take),
                    "neighbor_id": sel_ids.ravel(),
                    "cos": sel_sim.ravel(),
                }
            )
            yield out[out["cos"] != -np.inf]

    local = emb.mapInPandas(score, "query_id long, neighbor_id long, cos double")
    ranked = local.withColumn("sim", F.round("cos", 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


ORACLE_BLOCK_TOPK = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           round({_DUCK_DOT.format(a='q.v', b='e.v')} / (q.nrm * e.nrm), 6) AS sim
    FROM e q JOIN e ON q.vec_id < {N_BLOCK_QUERIES} AND q.vec_id <> e.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim
FROM ranked WHERE rank <= {TOPK}
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids as (label, dim, centroid) rows — the
    codebook-training / cluster-profiling primitive (a k-means iteration
    is exactly this groupBy with labels replaced by assignments).

    Vector components are exploded to (label, dim) and summed as
    DECIMAL(27,15) — decimal addition is associative/commutative, so the
    result is independent of partitioning and task order (a double sum is
    not), then divided once and rounded. One partial-aggregated shuffle
    on (label, dim): at 100 TB this is a bounded-key aggregation
    (labels x 64 dims), never a wide row.
    """
    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        F.posexplode(F.expr("transform(embedding, x -> cast(x AS double))")).alias(
            "dim0", "x"
        ),
    )
    agg = comp.groupBy("label", (F.col("dim0") + 1).alias("dim")).agg(
        F.sum(F.expr("cast(x AS decimal(27,15))")).alias("sx"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("sx").cast("double") / F.col("n"), 6).alias("centroid"),
        F.col("n").alias("n_vecs"),
    )


ORACLE_LABEL_CENTROIDS = """
WITH comp AS (
    SELECT label,
           unnest(list_transform(range(1, len(embedding) + 1),
                  i -> {'i': i, 'x': CAST(embedding[i] AS DOUBLE)})) AS u
    FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(u.i AS BIGINT) AS dim,
       round(CAST(sum(CAST(u.x AS DECIMAL(27,15))) AS DOUBLE) / count(*), 6) AS centroid,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM comp
GROUP BY label, u.i
"""


K_CLUSTERS = 8
KMEANS_ITERS = 2  # fixed, unrolled in the oracle

_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0.0 AS double), (acc, x) -> acc + x)"
)
_DUCK_SQDIST = (
    "list_reduce(list_transform(range(1, len({a}) + 1),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
)


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-means (Lloyd's) over the embedding corpus: KMEANS_ITERS
    rounds of assign (argmin squared L2, cid tiebreak) + recompute
    (per-dimension DECIMAL-sum means), deterministic end to end — init is
    the first K_CLUSTERS vectors, distances are sequential folds, and
    centroid means are partition-order-independent, so the DuckDB oracle
    (the same two rounds unrolled as CTEs) hash-matches exactly.

    The engine's iterative-ML surface: each round is one broadcast of the
    tiny centroid table + one corpus scan + one bounded-key ((cid, dim))
    aggregation — the canonical distributed Lloyd's step. At 100 TB (and
    more rounds) each iteration's assignment would persist/checkpoint to
    cut DAG growth; at 2 unrolled rounds the declarative DAG lets
    exchange reuse dedupe instead.
    """
    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("v")
    )
    assign, _ = _lloyd_rounds(e)
    return assign.select(
        "vec_id", F.col("cid").cast("long").alias("cid"), F.round("dist", 6).alias("dist")
    )


def _lloyd_rounds(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """KMEANS_ITERS deterministic Lloyd's rounds from first-K init over
    ``e(vec_id, v)``. Returns (last assignment, trained codebook): the
    assignment is the one computed inside the final round (against the
    codebook after ITERS-1 recenters — kmeans_assign's contract), the
    codebook has all ITERS recenters applied (what a serving path loads).
    """
    cent = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    assign = None
    for _ in range(KMEANS_ITERS):
        d = e.join(F.broadcast(cent), how="cross").withColumn(
            "dist", F.expr(_SQDIST.format(a="v", b="cv"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
        assign = (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", "cid", "dist")
        )
        comp = assign.select("cid", F.posexplode("v").alias("dim", "x"))
        vals = (
            comp.groupBy("cid", "dim")
            .agg(
                F.sum(F.expr("cast(x AS decimal(27,15))")).alias("sx"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cid", "dim", (F.col("sx").cast("double") / F.col("n")).alias("val")
            )
        )
        cent = vals.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, val))), s -> s.val)"
            ).alias("cv")
        )
    return assign, cent


_DUCK_ASSIGN = """
{out} AS (
    SELECT vec_id, v, cid, dist FROM (
        SELECT e.vec_id, e.v, c.cid,
               {dist} AS dist,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM e CROSS JOIN {cent} c
    ) WHERE rn = 1
)"""

_DUCK_RECENTER = """
{out} AS (
    SELECT cid, list(val ORDER BY dim) AS cv FROM (
        SELECT cid, u.dim AS dim,
               CAST(sum(CAST(u.x AS DECIMAL(27,15))) AS DOUBLE) / count(*) AS val
        FROM (
            SELECT cid, unnest(list_transform(range(1, len(v) + 1),
                       i -> {{'dim': i, 'x': v[i]}})) AS u
            FROM {assign}
        )
        GROUP BY cid, u.dim
    )
    GROUP BY cid
)"""

ORACLE_KMEANS_ASSIGN = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {K_CLUSTERS}),
{_DUCK_ASSIGN.format(out='a1', cent='c0', dist=_DUCK_SQDIST.format(a='e.v', b='c.cv'))},
{_DUCK_RECENTER.format(out='c1', assign='a1')},
{_DUCK_ASSIGN.format(out='a2', cent='c1', dist=_DUCK_SQDIST.format(a='e.v', b='c.cv'))}
SELECT vec_id, CAST(cid AS BIGINT) AS cid, round(dist, 6) AS dist FROM a2
"""


def ivf_topk_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN served from the TRAINED k-means codebook — `ivf_topk` with
    its first-K stand-in centroids replaced by `_lloyd_rounds`' output
    (KMEANS_ITERS Lloyd's rounds, first-K init), closing the train→serve
    loop the way a production IVF index is actually built (train offline,
    broadcast the codebook, bucket the corpus).

    Cell assignment and probing use squared L2 (argmin, cid tiebreak) —
    the SAME metric training minimized, so cells are the trained Voronoi
    partition; final ranking within probed cells is exact cosine, as in
    ivf_topk. Determinism end to end: decimal-mean centroids, sequential
    JVM folds for every distance/dot, and the oracle unrolls the
    identical training rounds as CTEs before applying identical probing.
    Scale shape is unchanged from ivf_topk: K_CLUSTERS rows broadcast,
    one corpus scan per training round + one for serving, candidates
    bounded by cell size x NPROBE.
    """
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    _, cent = _lloyd_rounds(emb.select("vec_id", "v"))
    aff = emb.join(F.broadcast(cent), how="cross").withColumn(
        "dist", F.expr(_SQDIST.format(a="v", b="cv"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    ranked = aff.withColumn("crank", F.row_number().over(w_assign))
    cells = ranked.filter(F.col("crank") == 1).select("vec_id", "cid")
    probes = (
        ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("crank") <= NPROBE))
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = (
        probes.join(cells, "cid")
        .select("query_id", "vec_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .join(qv, "query_id")
        .join(emb, "vec_id")
    )
    scored = cand.withColumn(
        "cos", F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("sim"),
        )
    )


ORACLE_IVF_TOPK_TRAINED = f"""
WITH en AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
e AS (SELECT vec_id, v FROM en),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {K_CLUSTERS}),
{_DUCK_ASSIGN.format(out='a1', cent='c0', dist=_DUCK_SQDIST.format(a='e.v', b='c.cv'))},
{_DUCK_RECENTER.format(out='c1', assign='a1')},
{_DUCK_ASSIGN.format(out='a2', cent='c1', dist=_DUCK_SQDIST.format(a='e.v', b='c.cv'))},
{_DUCK_RECENTER.format(out='c2', assign='a2')},
ranked AS (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_DUCK_SQDIST.format(a='e.v', b='c.cv')} ASC, c.cid ASC) AS crank
    FROM e CROSS JOIN c2 c
),
cells AS (SELECT vec_id, cid FROM ranked WHERE crank = 1),
probes AS (
    SELECT vec_id AS query_id, cid FROM ranked
    WHERE vec_id < {N_QUERIES} AND crank <= {NPROBE}
),
cand AS (
    SELECT DISTINCT p.query_id, c.vec_id
    FROM probes p JOIN cells c ON p.cid = c.cid
    WHERE p.query_id <> c.vec_id
),
scored AS (
    SELECT cand.query_id, cand.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a='q.v', b='n.v')} / (q.nrm * n.nrm) AS cos
    FROM cand
    JOIN en q ON cand.query_id = q.vec_id
    JOIN en n ON cand.vec_id = n.vec_id
),
final AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS sim
FROM final WHERE rank <= {TOPK}
"""


SEMDEDUP_K = 16  # cluster count for the bucketing pass (first-K init)
SEMDEDUP_THRESHOLD = 0.40


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding corpus, then compare pairs ONLY within a cluster and
    drop every vector that has a smaller-id neighbor above the cosine
    threshold — "semantically identical" points collapse to their lowest
    id. Output: the dropped vectors with the keeper they duplicate
    (smallest qualifying neighbor id, that neighbor's similarity).

    Scale shape (100 TB): one broadcast of the tiny centroid table + one
    corpus scan for assignment (argmin squared L2, cid tiebreak), then a
    self-equi-join keyed on cluster id — candidate pairs are bounded by
    cluster size (the SemDeDup design point), never corpus-quadratic; a
    production run raises SEMDEDUP_K so clusters stay ~constant-sized as
    the corpus grows, keeping per-key join fan-out flat. Dot products are
    strictly-sequential JVM folds, bit-identical to the DuckDB oracle.
    """
    tune(spark)
    e = _with_norm(load(spark, sf_dir, "embeddings"))
    cent = e.filter(F.col("vec_id") < SEMDEDUP_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    d = e.join(F.broadcast(cent), how="cross").withColumn(
        "dist", F.expr(_SQDIST.format(a="v", b="cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    asg = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )
    a = asg.select(
        F.col("cid"),
        F.col("vec_id").alias("dup_id"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    b = asg.select(
        F.col("cid"),
        F.col("vec_id").alias("keep_cand"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    pairs = a.join(b, "cid").filter(F.col("keep_cand") < F.col("dup_id"))
    scored = pairs.withColumn(
        "cos", F.expr(_DOT.format(a="av", b="bv")) / (F.col("an") * F.col("bn"))
    ).filter(F.col("cos") >= SEMDEDUP_THRESHOLD)
    return (
        scored.groupBy("dup_id")
        .agg(
            F.first("cid").alias("cid"),
            F.min(F.struct("keep_cand", "cos")).alias("k"),
        )
        .select(
            "dup_id",
            F.col("cid").cast("long").alias("cid"),
            F.col("k.keep_cand").alias("kept_id"),
            F.round("k.cos", 6).alias("sim"),
        )
    )


ORACLE_SEMANTIC_DEDUP = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {SEMDEDUP_K}),
asg AS (
    SELECT vec_id, v, nrm, cid FROM (
        SELECT e.vec_id, e.v, e.nrm, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_DUCK_SQDIST.format(a='e.v', b='c.cv')} ASC, c.cid ASC) AS rn
        FROM e CROSS JOIN c
    ) WHERE rn = 1
),
scored AS (
    SELECT a.vec_id AS dup_id, a.cid, b.vec_id AS keep_cand,
           {_DUCK_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) AS cos
    FROM asg a JOIN asg b ON a.cid = b.cid AND b.vec_id < a.vec_id
)
SELECT dup_id,
       CAST(any_value(cid) AS BIGINT) AS cid,
       min(keep_cand) AS kept_id,
       round(min_by(cos, keep_cand), 6) AS sim
FROM scored
WHERE cos >= {SEMDEDUP_THRESHOLD}
GROUP BY dup_id
"""


def semantic_dedup_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`semantic_dedup` served from the TRAINED k-means codebook instead
    of the first-K stand-in centroids — the same train→serve closure
    `ivf_topk_trained` gives IVF, applied to SemDeDup: cluster quality
    now comes from KMEANS_ITERS Lloyd's rounds, so "compare only within
    a cluster" compares within a trained Voronoi cell. Everything else —
    within-cluster pair join bounded by cell size, smallest-id keeper,
    sequential-fold dot products — is semantic_dedup's audited shape;
    the oracle unrolls the identical training rounds before the same
    pair logic."""
    tune(spark)
    e = _with_norm(load(spark, sf_dir, "embeddings"))
    _, cent = _lloyd_rounds(e.select("vec_id", "v"))
    d = e.join(F.broadcast(cent), how="cross").withColumn(
        "dist", F.expr(_SQDIST.format(a="v", b="cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    asg = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )
    a = asg.select(
        F.col("cid"),
        F.col("vec_id").alias("dup_id"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    b = asg.select(
        F.col("cid"),
        F.col("vec_id").alias("keep_cand"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    pairs = a.join(b, "cid").filter(F.col("keep_cand") < F.col("dup_id"))
    scored = pairs.withColumn(
        "cos", F.expr(_DOT.format(a="av", b="bv")) / (F.col("an") * F.col("bn"))
    ).filter(F.col("cos") >= SEMDEDUP_THRESHOLD)
    return (
        scored.groupBy("dup_id")
        .agg(
            F.first("cid").alias("cid"),
            F.min(F.struct("keep_cand", "cos")).alias("k"),
        )
        .select(
            "dup_id",
            F.col("cid").cast("long").alias("cid"),
            F.col("k.keep_cand").alias("kept_id"),
            F.round("k.cos", 6).alias("sim"),
        )
    )


ORACLE_SEMANTIC_DEDUP_TRAINED = f"""
WITH en AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
e AS (SELECT vec_id, v FROM en),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {K_CLUSTERS}),
{_DUCK_ASSIGN.format(out='a1', cent='c0', dist=_DUCK_SQDIST.format(a='e.v', b='c.cv'))},
{_DUCK_RECENTER.format(out='c1', assign='a1')},
{_DUCK_ASSIGN.format(out='a2', cent='c1', dist=_DUCK_SQDIST.format(a='e.v', b='c.cv'))},
{_DUCK_RECENTER.format(out='c2', assign='a2')},
asg AS (
    SELECT r.vec_id, n.v, n.nrm, r.cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_DUCK_SQDIST.format(a='e.v', b='c.cv')} ASC, c.cid ASC) AS rn
        FROM e CROSS JOIN c2 c
    ) r JOIN en n ON r.vec_id = n.vec_id
    WHERE r.rn = 1
),
scored AS (
    SELECT a.vec_id AS dup_id, a.cid, b.vec_id AS keep_cand,
           {_DUCK_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) AS cos
    FROM asg a JOIN asg b ON a.cid = b.cid AND b.vec_id < a.vec_id
)
SELECT dup_id,
       CAST(any_value(cid) AS BIGINT) AS cid,
       min(keep_cand) AS kept_id,
       round(min_by(cos, keep_cand), 6) AS sim
FROM scored
WHERE cos >= {SEMDEDUP_THRESHOLD}
GROUP BY dup_id
"""


# --- Product quantization (PQ) — the compressed-corpus ANN path --------------
# Reference scope: the reference engine's similarity surface stops at exact
# scoring; PQ is the public-domain scale extension (Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search") that makes 100 TB of
# embeddings searchable: the corpus is stored as M small codes (here 4
# bytes/vector instead of 256 bytes of floats) and queries scan codes with
# per-subspace lookup tables instead of full dot products.

PQ_M = 4  # subspaces per vector (64 dims -> 4 x 16)
PQ_SUB = 16  # dimensions per subspace
PQ_K = 16  # codewords per sub-codebook (vec_id < PQ_K are the codewords)

# Per-row, all-JVM encode kernel: for each subspace m, the squared L2
# distance from this row's m-th subvector to EVERY codeword's m-th
# subvector. ``cb`` is the cid-sorted codebook array (one broadcast row),
# so array_position of the min is (cid + 1) — first match = lowest cid,
# the same tiebreak the oracle's (d ASC, cid ASC) window applies.
_PQ_DD = (
    f"transform(sequence(0, {PQ_M - 1}), m -> "
    "transform(cb, c -> "
    f"aggregate(zip_with(slice(v, m * {PQ_SUB} + 1, {PQ_SUB}),"
    f" slice(c.cv, m * {PQ_SUB} + 1, {PQ_SUB}),"
    " (x, y) -> (x - y) * (x - y)), cast(0.0 as double), (acc, x) -> acc + x)))"
)

_DUCK_PQ_SQDIST = (
    f"list_reduce(list_transform(range(1, {PQ_SUB} + 1),"
    " i -> ({a}[m * {S} + i] - {b}[m * {S} + i])"
    " * ({a}[m * {S} + i] - {b}[m * {S} + i])), (acc, x) -> acc + x)"
)


def _pq_codes(e: DataFrame, cb_src: DataFrame | None = None) -> DataFrame:
    """PQ-encode ``e(vec_id, v)`` -> (vec_id, sub_id, code, sdist).

    The codebook (first PQ_K vectors) collapses to ONE row of cid-sorted
    structs and broadcast-joins onto the corpus; encoding is then a pure
    map — per row, PQ_M x PQ_K sequential-fold distances inside one JVM
    expression, zero shuffle of the corpus. That is the shape that holds
    at 100 TB: encode cost is a single streaming pass, and the only data
    movement is the tiny codebook.

    ``cb_src`` lets a STREAMING caller supply the codebook from a static
    (batch) frame — a streaming ``e`` cannot be aggregated into the
    1-row codebook, and a production encoder loads a trained codebook
    anyway (see streaming.jobs.stream_pq_encode)."""
    cb = (cb_src if cb_src is not None else e).filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    cb_row = cb.groupBy().agg(
        F.expr("array_sort(collect_list(struct(cid, cv)))").alias("cb")
    )
    return (
        e.crossJoin(F.broadcast(cb_row))
        .select("vec_id", F.posexplode(F.expr(_PQ_DD)).alias("sub_id", "dists"))
        .select(
            "vec_id",
            F.col("sub_id").cast("int").alias("sub_id"),
            (F.expr("array_position(dists, array_min(dists))").cast("int") - 1).alias(
                "code"
            ),
            F.expr("array_min(dists)").alias("sdist"),
        )
    )


def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codes for the whole corpus: per (vector, subspace), the nearest
    sub-codeword (argmin squared L2, lowest-cid tiebreak) and its
    quantization error. The artifact an ADC index stores."""
    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("v")
    )
    return _pq_codes(e).select(
        "vec_id", "sub_id", "code", F.round("sdist", 6).alias("sdist")
    )


_DUCK_PQ_CTES = f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {PQ_K}),
sub AS (
    SELECT e.vec_id, u.m, cb.cid,
           {_DUCK_PQ_SQDIST.format(a='e.v', b='cb.cv', S=PQ_SUB)} AS d
    FROM e CROSS JOIN cb CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) u
),
codes AS (
    SELECT vec_id, m, cid, d FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id, m ORDER BY d ASC, cid ASC) AS rn
        FROM sub
    ) WHERE rn = 1
)"""

ORACLE_PQ_ENCODE = f"""
WITH {_DUCK_PQ_CTES}
SELECT vec_id, CAST(m AS INT) AS sub_id, CAST(cid AS INT) AS code,
       round(d, 6) AS sdist
FROM codes
"""


def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-encoded corpus: each
    query precomputes a PQ_M x PQ_K lookup table of exact
    subvector-to-codeword distances; a corpus vector's approximate
    distance is then the SUM of M table lookups — no floats from the
    corpus are touched, only its codes.

    Scale shape (100 TB): the LUT is N_QUERIES x PQ_M x PQ_K rows —
    broadcast; the corpus code table streams through one broadcast-hash
    join keyed (sub_id, code) and one partial-agg sum per (query, vec).
    Per-subspace distances are summed as DECIMAL(27,15) (exact,
    order-independent), so ranking ties cannot float and the DuckDB
    oracle hash-matches; ranking is (adist ASC, vec_id ASC).
    """
    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("v")
    )
    codes = _pq_codes(e).select("vec_id", "sub_id", "code")
    return adc_topk_from_codes(codes, e)


def adc_topk_from_codes(
    codes: DataFrame, e: DataFrame, cand: DataFrame | None = None
) -> DataFrame:
    """ADC top-k against an EXTERNAL code table — the serving half of
    pq_adc_topk, reusable when the codes come from a maintained index
    store instead of inline encoding (streaming.jobs
    stream_pq_index_serve). ``codes``: (vec_id, sub_id, code); ``e``:
    (vec_id, v) supplying queries and the codebook. ``cand`` (optional):
    (query_id, vec_id) pairs restricting which vectors each query scores
    — the IVF probe set (ivfpq_topk); without it every query scores the
    whole code table. One definition of the LUT build, the decimal-exact
    sum, and the ranking contract for all three ADC consumers."""
    cb = e.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    lut = (
        q.crossJoin(cb)
        .select(
            "query_id",
            "cid",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {PQ_M - 1}), m -> "
                    + _SQDIST.format(
                        a=f"slice(qv, m * {PQ_SUB} + 1, {PQ_SUB})",
                        b=f"slice(cv, m * {PQ_SUB} + 1, {PQ_SUB})",
                    )
                    + ")"
                )
            ).alias("sub_id", "ld"),
        )
    )
    if cand is None:
        j = codes.join(
            F.broadcast(lut),
            (codes.sub_id == lut.sub_id)
            & (codes.code == lut.cid)
            & (codes.vec_id != lut.query_id),
        ).drop(lut.sub_id, lut.cid)
    else:
        cc = cand.join(codes, "vec_id")
        j = cc.join(
            F.broadcast(lut),
            (cc.sub_id == lut.sub_id)
            & (cc.code == lut.cid)
            & (cc.query_id == lut.query_id),
        ).drop(lut.query_id)
    adc = j.groupBy("query_id", "vec_id").agg(
        F.sum(F.expr("cast(ld AS decimal(27,15))")).alias("adist_dec")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist_dec"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round(F.col("adist_dec").cast("double"), 6).alias("adist"),
        )
    )


ORACLE_PQ_ADC_TOPK = f"""
WITH {_DUCK_PQ_CTES},
lut AS (
    SELECT q.vec_id AS query_id, u.m, cb.cid,
           {_DUCK_PQ_SQDIST.format(a='q.v', b='cb.cv', S=PQ_SUB)} AS ld
    FROM e q CROSS JOIN cb CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) u
    WHERE q.vec_id < {N_QUERIES}
),
adc AS (
    SELECT l.query_id, c.vec_id,
           sum(CAST(l.ld AS DECIMAL(27,15))) AS adist_dec
    FROM codes c
    JOIN lut l ON c.m = l.m AND c.cid = l.cid AND c.vec_id <> l.query_id
    GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(CAST(adist_dec AS DOUBLE), 6) AS adist
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adist_dec ASC, vec_id ASC) AS rank
    FROM adc
)
WHERE rank <= {TOPK}
"""


def ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ combined — the production ANN serving stack (FAISS's
    IVFPQ, Jégou et al. 2011 §V): an inverted file bounds WHICH vectors a
    query touches (NPROBE nearest cells by squared L2), and product
    quantization bounds WHAT is read per touched vector (M code lookups,
    no corpus floats). Composes this engine's audited pieces: first-K
    cell centroids + argmin assignment (ivf shape), `_pq_codes` for the
    code table, the broadcast LUT + DECIMAL-exact ADC sum, ranking
    (adist ASC, vec_id ASC).

    Scale shape (100 TB): query cost = corpus/n_cells * nprobe vectors x
    M byte-sized lookups — the product of both prunings; everything
    shuffles only on (cid) and (query, vec) bounded keys, the LUT and
    centroids broadcast. Recall is partial by construction (cell miss +
    quantization); the oracle applies identical probing so the contract
    is exact.
    """
    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("v")
    )
    cent = e.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("ivf_cid"), F.col("v").alias("icv")
    )
    aff = e.join(F.broadcast(cent), how="cross").withColumn(
        "idist", F.expr(_SQDIST.format(a="v", b="icv"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.asc("idist"), F.asc("ivf_cid"))
    ranked = aff.withColumn("crank", F.row_number().over(w_assign))
    cells = ranked.filter(F.col("crank") == 1).select("vec_id", "ivf_cid")
    probes = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crank") <= NPROBE)
    ).select(F.col("vec_id").alias("query_id"), "ivf_cid")
    cand = (
        probes.join(cells, "ivf_cid")
        .select("query_id", "vec_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .distinct()
    )
    codes = _pq_codes(e).select("vec_id", "sub_id", "code")
    # shared ADC contract (LUT build, decimal-exact sum, ranking) with
    # the probe set restricting candidates — see adc_topk_from_codes
    return adc_topk_from_codes(codes, e, cand=cand)


ORACLE_IVFPQ_TOPK = f"""
WITH {_DUCK_PQ_CTES},
ivc AS (SELECT vec_id AS ivf_cid, v AS icv FROM e WHERE vec_id < {N_CELLS}),
iaff AS (
    SELECT e.vec_id, ivc.ivf_cid,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_DUCK_SQDIST.format(a='e.v', b='ivc.icv')} ASC,
                        ivc.ivf_cid ASC) AS crank
    FROM e CROSS JOIN ivc
),
cells AS (SELECT vec_id, ivf_cid FROM iaff WHERE crank = 1),
probes AS (
    SELECT vec_id AS query_id, ivf_cid FROM iaff
    WHERE vec_id < {N_QUERIES} AND crank <= {NPROBE}
),
cand AS (
    SELECT DISTINCT p.query_id, c.vec_id
    FROM probes p JOIN cells c ON p.ivf_cid = c.ivf_cid
    WHERE p.query_id <> c.vec_id
),
lut AS (
    SELECT q.vec_id AS query_id, u.m, cb.cid,
           {_DUCK_PQ_SQDIST.format(a='q.v', b='cb.cv', S=PQ_SUB)} AS ld
    FROM e q CROSS JOIN cb CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) u
    WHERE q.vec_id < {N_QUERIES}
),
adc AS (
    SELECT ca.query_id, ca.vec_id,
           sum(CAST(l.ld AS DECIMAL(27,15))) AS adist_dec
    FROM cand ca
    JOIN codes c ON ca.vec_id = c.vec_id
    JOIN lut l ON c.m = l.m AND c.cid = l.cid AND l.query_id = ca.query_id
    GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(CAST(adist_dec AS DOUBLE), 6) AS adist
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adist_dec ASC, vec_id ASC) AS rank
    FROM adc
)
WHERE rank <= {TOPK}
"""


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximation SELF-MEASUREMENT — the recall ledger any production
    ANN deployment keeps: per query, how many of the exact brute-force
    top-k did the IVF index and the IVF+PQ index actually return?
    Integer set intersections (hits out of k), so the report hash-matches
    the oracle exactly — recall becomes a pinned CONTRACT, not a hope;
    an index regression (bad centroids, broken codes) fails correctness,
    not just quality dashboards.

    Scale shape: three audited serving pipelines (exact / IVF / IVFPQ)
    plus two equi-joins on (query, neighbor) — the report costs no more
    than running the indexes it audits; on a cluster the exact side runs
    on a sampled query set, same plan.
    """
    tune(spark)
    exact = ann_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ivf_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("ivf_hit")
    )
    ivfpq = ivfpq_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("pq_hit")
    )
    j = exact.join(ivf, ["query_id", "neighbor_id"], "left").join(
        ivfpq, ["query_id", "neighbor_id"], "left"
    )
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.count("ivf_hit").alias("hits_ivf"),
        F.count("pq_hit").alias("hits_ivfpq"),
    )


ORACLE_ANN_RECALL_REPORT = f"""
WITH exact AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_TOPK}) t),
ivf AS (SELECT query_id, neighbor_id FROM ({ORACLE_IVF_TOPK}) t),
pq AS (SELECT query_id, neighbor_id FROM ({ORACLE_IVFPQ_TOPK}) t)
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS k,
       CAST(count(i.neighbor_id) AS BIGINT) AS hits_ivf,
       CAST(count(p.neighbor_id) AS BIGINT) AS hits_ivfpq
FROM exact e
LEFT JOIN ivf i ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
LEFT JOIN pq p ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id
GROUP BY e.query_id
"""


MRL_DIMS = (16, 32, 64)  # matryoshka truncation levels (full dim last)


def mrl_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA truncation ledger (Kusupati et al. 2022): brute-force
    cosine top-k per query at each embedding PREFIX length (16/32/64 of
    the 64-dim fixture) and, per (query, dim), how many of the FULL-dim
    top-k the truncated ranking recovers. The design question this
    answers at 100 TB: how short can the cheap first-pass vector be
    before rerank recall collapses — the short-prefix scan reads dim/64
    of the float bytes per candidate, so the ledger prices the
    bandwidth/recall trade directly, and pinning it as a hash contract
    (the sim_ann_recall_report discipline) turns an embedding-pipeline
    regression (wrong slice, re-ordered dims) into a correctness
    failure.

    One corpus pass scores ALL truncation levels: the elementwise
    product vector is computed once per (query, vector) pair and each
    level folds a PREFIX of it (left fold from 0.0, the engine-parity
    convention _DOT pins), so adding a level adds an aggregate over an
    already-materialized array, not a scan. Ranking + set intersection
    are the audited topk/recall idioms shared with ann_topk /
    ann_recall_report."""
    tune(spark)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias("v"),
    )
    norm_cols = [
        F.expr(
            f"sqrt(aggregate(transform(slice(v, 1, {d}), x -> x * x),"
            " cast(0.0 AS double), (acc, x) -> acc + x))"
        ).alias(f"n{d}")
        for d in MRL_DIMS
    ]
    e = emb.select("vec_id", "v", *norm_cols)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        *[F.col(f"n{d}").alias(f"qn{d}") for d in MRL_DIMS],
    )
    pairs = F.broadcast(q).join(e, F.col("query_id") != F.col("vec_id"))
    scored = pairs.withColumn(
        "p", F.expr("zip_with(qv, v, (x, y) -> x * y)")
    ).select(
        "query_id",
        "vec_id",
        *[
            (
                F.expr(
                    f"aggregate(slice(p, 1, {d}), cast(0.0 AS double),"
                    " (acc, x) -> acc + x)"
                )
                / (F.col(f"qn{d}") * F.col(f"n{d}"))
            ).alias(f"cos{d}")
            for d in MRL_DIMS
        ],
    )
    stack_args = ", ".join(f"{d}L, cos{d}" for d in MRL_DIMS)
    stacked = scored.selectExpr(
        "query_id", "vec_id", f"stack({len(MRL_DIMS)}, {stack_args}) AS (dim, cos)"
    )
    w = Window.partitionBy("query_id", "dim").orderBy(F.desc("cos"), F.asc("vec_id"))
    topk = (
        stacked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("dim", "query_id", F.col("vec_id").alias("neighbor_id"))
    )
    truth = topk.filter(F.col("dim") == MRL_DIMS[-1]).select(
        "query_id", "neighbor_id"
    )
    probe = truth.withColumn(
        "dim", F.explode(F.array(*[F.lit(d).cast("long") for d in MRL_DIMS]))
    )
    # both sides of the hits join are <= N_QUERIES x TOPK x |dims| rows;
    # a LeftOuter broadcast must build RIGHT, so the hint goes on the
    # ranked side (already reduced by the WindowGroupLimit pushdown)
    j = probe.join(
        F.broadcast(topk.withColumn("hit", F.lit(1))),
        ["dim", "query_id", "neighbor_id"],
        "left",
    )
    return j.groupBy("query_id", "dim").agg(
        F.count("hit").alias("hits"),
        (F.count("hit").cast("double") / F.lit(float(TOPK))).alias("recall"),
    )


_MRL_DIMS_SQL = ", ".join(str(d) for d in MRL_DIMS)

ORACLE_MRL_TRUNCATION_RECALL = f"""
WITH dims AS (SELECT unnest([{_MRL_DIMS_SQL}]) AS dim),
e AS (
    SELECT d.dim, x.vec_id, x.v,
           sqrt(list_reduce(list_transform(range(1, d.dim + 1),
                i -> x.v[i] * x.v[i]), (acc, y) -> acc + y)) AS nrm
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) x
    CROSS JOIN dims d
),
scored AS (
    SELECT q.dim, q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_reduce(list_transform(range(1, q.dim + 1),
                i -> q.v[i] * c.v[i]), (acc, y) -> acc + y)
             / (q.nrm * c.nrm) AS cos
    FROM e q JOIN e c ON q.dim = c.dim
     AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
topk AS (
    SELECT dim, query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY dim, query_id ORDER BY cos DESC, neighbor_id ASC
        ) AS rank FROM scored
    ) WHERE rank <= {TOPK}
),
truth AS (
    SELECT query_id, neighbor_id FROM topk WHERE dim = {MRL_DIMS[-1]}
)
SELECT t.query_id, CAST(d.dim AS BIGINT) AS dim,
       CAST(count(c.neighbor_id) AS BIGINT) AS hits,
       CAST(count(c.neighbor_id) AS DOUBLE) / {TOPK} AS recall
FROM truth t
CROSS JOIN dims d
LEFT JOIN topk c ON c.dim = d.dim AND c.query_id = t.query_id
 AND c.neighbor_id = t.neighbor_id
GROUP BY 1, 2
"""


def ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index HEALTH ledger: the cell-size distribution of the
    centroid assignment (cells used, min/max/mean members, imbalance =
    max/mean). At 100 TB the probe cost of ivf_topk and the IVF-served
    miner is corpus/n_cells x nprobe ONLY if cells are balanced — one
    hot cell turns every probe that touches it into a near-linear scan,
    so production indexes alarm on exactly this ratio (FAISS's
    imbalance_factor). Pinned as a hash contract via integer stats +
    two deterministic double divisions, same discipline as
    sim_ann_recall_report; assignment comes from the shared
    _cell_ranked pass, so the report audits the very cells the serving
    path probes. One corpus pass + one bounded (<= N_CELLS rows)
    aggregation — report cost is assignment cost."""
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    cells = _cell_ranked(emb).filter(F.col("crank") == 1).select("vec_id", "cid")
    sz = cells.groupBy("cid").agg(F.count(F.lit(1)).alias("sz"))
    return sz.agg(
        F.count(F.lit(1)).alias("cells_used"),
        F.min("sz").alias("min_sz"),
        F.max("sz").alias("max_sz"),
        (F.sum("sz").cast("double") / F.count(F.lit(1))).alias("avg_sz"),
        (
            (F.max("sz") * F.count(F.lit(1))).cast("double") / F.sum("sz")
        ).alias("imbalance"),
    )


ORACLE_IVF_CELL_BALANCE = f"""
WITH {_DUCK_IVF_SCORED_CTES},
sz AS (SELECT cid, count(*) AS sz FROM cells GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS cells_used,
       CAST(min(sz) AS BIGINT) AS min_sz,
       CAST(max(sz) AS BIGINT) AS max_sz,
       CAST(sum(sz) AS DOUBLE) / count(*) AS avg_sz,
       CAST(max(sz) * count(*) AS DOUBLE) / sum(sz) AS imbalance
FROM sz
"""


def pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook HEALTH ledger, the quantization companion to
    sim_ivf_cell_balance: per subspace, the corpus count and total/mean
    squared quantization error of the assigned codewords. Rising
    distortion in one subspace is how a stale or mis-sliced codebook
    shows up long before recall dashboards move — FAISS reports exactly
    this as imbalance/quantization error per quantizer. Distortion
    totals are summed as DECIMAL(27,15) (exact, order-independent —
    the ADC discipline), then cast to double ONCE before the rounded
    division, so the report hash-pins despite being float-valued.
    Cost: the encode pass it audits plus a PQ_M-row aggregation."""
    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("v")
    )
    agg = _pq_codes(e).groupBy("sub_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("sdist").cast("decimal(27,15)")).alias("S"),
    )
    return agg.select(
        "sub_id",
        "n_vectors",
        F.round(F.col("S").cast("double"), 6).alias("total_sdist"),
        F.round(F.col("S").cast("double") / F.col("n_vectors"), 6).alias(
            "avg_sdist"
        ),
    )


ORACLE_PQ_DISTORTION = f"""
WITH {_DUCK_PQ_CTES},
agg AS (
    SELECT m, count(*) AS n_vectors,
           sum(CAST(d AS DECIMAL(27,15))) AS S
    FROM codes GROUP BY 1
)
SELECT CAST(m AS INT) AS sub_id, CAST(n_vectors AS BIGINT) AS n_vectors,
       round(CAST(S AS DOUBLE), 6) AS total_sdist,
       round(CAST(S AS DOUBLE) / n_vectors, 6) AS avg_sdist
FROM agg
"""


NPROBE_SWEEP = (1, 2, 4, 8)


def ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF TUNING curve — recall@k vs probe cost across nprobe values,
    the calibration table every IVF deployment reads before pinning its
    serving nprobe (the text-threshold-sweep discipline applied to the
    index): per (query, nprobe), how many of the brute-force top-k the
    probe-limited exact ranking recovers, plus the candidate count the
    query paid for it. Probe sets are NESTED in nprobe (crank <= p), so
    ONE assignment pass (_cell_ranked, shared with serving and the
    cell-balance ledger) feeds every sweep point: candidates are
    generated once at the widest nprobe with their cell rank attached,
    and each sweep point filters crank <= p before its own ranking —
    no per-point corpus pass. Hash-pinned integers (hits, candidates)
    + the recall division, so index drift fails correctness."""
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    ranked = _cell_ranked(emb)
    cells = ranked.filter(F.col("crank") == 1).select("vec_id", "cid")
    probes = (
        ranked.filter(
            (F.col("vec_id") < N_QUERIES) & (F.col("crank") <= max(NPROBE_SWEEP))
        )
        .select(F.col("vec_id").alias("query_id"), "cid", F.col("crank").alias("prank"))
    )
    cand = (
        F.broadcast(probes)
        .join(cells, "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", "prank")
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(emb, "vec_id")
        .withColumn(
            "cos", F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm"))
        )
        .select("query_id", "vec_id", "prank", "cos")
    )
    swept = scored.withColumn(
        "nprobe",
        F.explode(
            F.array(*[F.lit(p).cast("long") for p in NPROBE_SWEEP])
        ),
    ).filter(F.col("prank") <= F.col("nprobe"))
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    topk = (
        swept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("nprobe", "query_id", F.col("vec_id").alias("neighbor_id"))
    )
    n_cand = swept.groupBy("nprobe", "query_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    exact = ann_topk(spark, sf_dir).select("query_id", "neighbor_id")
    probe_rows = exact.withColumn(
        "nprobe",
        F.explode(F.array(*[F.lit(p).cast("long") for p in NPROBE_SWEEP])),
    )
    hits = (
        probe_rows.join(
            F.broadcast(topk.withColumn("hit", F.lit(1))),
            ["nprobe", "query_id", "neighbor_id"],
            "left",
        )
        .groupBy("nprobe", "query_id")
        .agg(F.count("hit").alias("hits"))
    )
    return hits.join(n_cand, ["nprobe", "query_id"]).select(
        "query_id",
        "nprobe",
        "n_candidates",
        "hits",
        (F.col("hits").cast("double") / F.lit(float(TOPK))).alias("recall"),
    )


_NPROBE_SQL = ", ".join(str(p) for p in NPROBE_SWEEP)

ORACLE_IVF_NPROBE_SWEEP = f"""
WITH {_DUCK_IVF_SCORED_CTES},
sweep AS (SELECT unnest([{_NPROBE_SQL}]) AS nprobe),
probes_r AS (
    SELECT vec_id AS query_id, cid, crank AS prank FROM ranked
    WHERE vec_id < {N_QUERIES} AND crank <= {max(NPROBE_SWEEP)}
),
cand_r AS (
    SELECT p.query_id, c.vec_id, p.prank
    FROM probes_r p JOIN cells c ON p.cid = c.cid
    WHERE p.query_id <> c.vec_id
),
swept AS (
    SELECT s.nprobe, cr.query_id, cr.vec_id,
           {_DUCK_DOT.format(a='q.v', b='n.v')} / (q.nrm * n.nrm) AS cos
    FROM cand_r cr
    CROSS JOIN sweep s
    JOIN e q ON cr.query_id = q.vec_id
    JOIN e n ON cr.vec_id = n.vec_id
    WHERE cr.prank <= s.nprobe
),
topk_p AS (
    SELECT nprobe, query_id, vec_id AS neighbor_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY nprobe, query_id ORDER BY cos DESC, vec_id ASC
        ) AS rank FROM swept
    ) WHERE rank <= {TOPK}
),
n_cand AS (
    SELECT nprobe, query_id, count(*) AS n_candidates
    FROM swept GROUP BY 1, 2
),
exact AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_TOPK}) t)
SELECT h.query_id, CAST(h.nprobe AS BIGINT) AS nprobe,
       CAST(nc.n_candidates AS BIGINT) AS n_candidates,
       CAST(h.hits AS BIGINT) AS hits,
       CAST(h.hits AS DOUBLE) / {TOPK} AS recall
FROM (
    SELECT s.nprobe, x.query_id, count(t.neighbor_id) AS hits
    FROM exact x
    CROSS JOIN sweep s
    LEFT JOIN topk_p t ON t.nprobe = s.nprobe AND t.query_id = x.query_id
     AND t.neighbor_id = x.neighbor_id
    GROUP BY 1, 2
) h
JOIN n_cand nc ON h.nprobe = nc.nprobe AND h.query_id = nc.query_id
"""


def _with_norm_label(emb: DataFrame) -> DataFrame:
    """_with_norm plus the label column — the filtered-search variants
    need the metadata attribute riding alongside the vector."""
    return emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.expr("transform(embedding, x -> cast(x AS double))").alias("v"),
    ).withColumn(
        "nrm",
        F.expr(
            "sqrt(aggregate(transform(v, x -> x * x), cast(0.0 AS double), (acc, x) -> acc + x))"
        ),
    )


def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search, brute-force baseline: top-k cosine
    neighbors restricted to corpus vectors satisfying a metadata
    predicate — here label = the query's own label (category-constrained
    search, the canonical filtered-ANN workload). The filter is a
    PRE-filter: it lives in the join condition, so ineligible vectors
    are dropped before any dot product is computed — never a post-filter
    over an unconstrained top-k, which under-fills k when the filter is
    selective (the classic filtered-ANN failure mode).

    Scale shape: identical to ann_topk (tiny broadcast query side, one
    corpus scan) — the predicate only narrows the scored set. The
    n_eligible column ledgers the per-query selectivity so an operator
    can see when a filter is tight enough to warrant a per-label
    partition layout instead."""
    tune(spark)
    emb = _with_norm_label(load(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = F.broadcast(q).join(
        emb,
        (F.col("query_id") != F.col("vec_id")) & (F.col("qlabel") == F.col("label")),
    )
    scored = pairs.withColumn(
        "cos", F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "n_eligible",
            F.count(F.lit(1)).over(Window.partitionBy("query_id")).cast("long"),
        )
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("qlabel").alias("label"),
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("sim"),
            "n_eligible",
        )
    )


ORACLE_ANN_FILTERED_TOPK = f"""
WITH e AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, q.label, e.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a='q.v', b='e.v')} / (q.nrm * e.nrm) AS cos
    FROM e q JOIN e ON q.vec_id < {N_QUERIES} AND q.vec_id <> e.vec_id
                   AND q.label = e.label
),
ranked AS (
    SELECT query_id, label, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank,
           count(*) OVER (PARTITION BY query_id) AS n_eligible
    FROM scored
)
SELECT query_id, label, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(cos, 6) AS sim, CAST(n_eligible AS BIGINT) AS n_eligible
FROM ranked WHERE rank <= {TOPK}
"""


def ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered search on the IVF index: the label predicate is pushed
    INTO the probe plan — candidates are the probed-cell members that
    ALSO carry the query's label, filtered before any exact scoring
    (pre-filter on the inverted lists, the strategy real vector stores
    use when the filter is moderately selective; the alternative —
    post-filtering an unconstrained top-k — silently under-fills k).
    Probe semantics are _ivf_probe_candidates, shared verbatim with
    ivf_topk and hard_negatives_ivf. Recall vs the brute-force filtered
    truth is partial exactly as in unfiltered IVF: a filtered neighbor
    outside the probed cells is missed — per-cell label skew makes this
    WORSE than unfiltered recall, which is why the two entries pair."""
    tune(spark)
    embl = _with_norm_label(load(spark, sf_dir, "embeddings"))
    emb = embl.select("vec_id", "v", "nrm")
    qv = embl.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    labels = embl.select("vec_id", "label")
    cand = (
        _ivf_probe_candidates(emb)
        .join(qv, "query_id")
        .join(labels, "vec_id")
        .filter(F.col("qlabel") == F.col("label"))
        .join(emb, "vec_id")
    )
    scored = cand.withColumn(
        "cos", F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("qlabel").alias("label"),
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("sim"),
        )
    )


ORACLE_IVF_FILTERED_TOPK = f"""
WITH {_DUCK_IVF_SCORED_CTES},
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
filt AS (
    SELECT s.query_id, ql.label, s.neighbor_id, s.cos
    FROM scored s
    JOIN lab ql ON s.query_id = ql.vec_id
    JOIN lab nl ON s.neighbor_id = nl.vec_id
    WHERE ql.label = nl.label
),
final AS (
    SELECT query_id, label, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM filt
)
SELECT query_id, label, neighbor_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS sim
FROM final WHERE rank <= {TOPK}
"""


# --- Cosine range search (round 10) ------------------------------------------

RANGE_RADIUS = 0.30  # cosine floor: return ALL neighbors with cos >= radius


def range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine RANGE query — every corpus vector within the
    RANGE_RADIUS cosine ball of each query (the Faiss `range_search`
    API shape, complementing top-k): the retrieval mode dedup and
    contamination sweeps want ("give me EVERYTHING at least this
    similar", not "the 10 best"). Brute-force exact baseline: the query
    side (N_QUERIES rows) broadcasts against one corpus scan — the same
    audit-twin role ann_topk/hard_negatives play for their IVF
    counterparts. Result size is data-dependent by design; rank rides
    along (cos DESC, vec_id ASC) so callers can cut consistent
    prefixes."""
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        emb.join(F.broadcast(q), how="cross")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm")),
        )
        .filter(F.col("cos") >= RANGE_RADIUS)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.row_number().over(w).cast("long").alias("rank"),
        F.round("cos", 6).alias("sim"),
    )


ORACLE_RANGE_SEARCH = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           {_DUCK_NORM.format(v='embedding::DOUBLE[]')} AS nrm
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a='q.v', b='e.v')} / (q.nrm * e.nrm) AS cos
    FROM e q JOIN e ON q.vec_id < {N_QUERIES} AND q.vec_id <> e.vec_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
            AS BIGINT) AS rank,
       round(cos, 6) AS sim
FROM scored WHERE cos >= {RANGE_RADIUS}
"""


def ivf_range_search(
    spark: SparkSession, sf_dir: str, exact_sample_hex: str | None = None
) -> DataFrame:
    """Range search served from the IVF probe plan — the 100 TB path:
    candidates are _ivf_probe_candidates (the exact generator ivf_topk
    and hard_negatives_ivf serve from), so cost is corpus * nprobe /
    n_cells per query instead of a corpus scan. Every emitted row is
    exact by construction (an in-radius candidate is in the true
    in-radius set — the index can only MISS, never hallucinate), so the
    quality contract is the per-query ``n_exact`` recall denominator
    riding along: found-vs-n_exact is the index's range recall, pinned
    as a hash contract like hits_exact in hard_negatives_ivf.

    ``exact_sample_hex`` (VERDICT r10 ask #2, mirroring
    hard_negatives_ivf): at a real query volume the exact denominator
    runs only over the deterministic md5-threshold query sample — the
    query_id predicate pushes through the rank window into
    range_search's broadcast query side, so the brute-force audit join
    really shrinks — and unsampled queries carry the -1 "not audited"
    sentinel in n_exact. Default None keeps the full-audit contract."""
    tune(spark)
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    found = (
        _ivf_probe_candidates(emb)
        .join(F.broadcast(qv), "query_id")
        .join(emb, "vec_id")
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm")),
        )
        .filter(F.col("cos") >= RANGE_RADIUS)
    )
    return range_rank_finish(
        found.select("query_id", "vec_id", "cos"),
        range_exact_counts(spark, sf_dir, exact_sample_hex),
        exact_sample_hex=exact_sample_hex,
    )


RANGE_MISS_NEIGHBOR = -1  # sentinel: in-radius truth exists, index found none
RANGE_MISS_SIM = -2.0  # impossible cosine marking the sentinel row
RANGE_EXACT_SAMPLE_SEED = "range-exact:"  # md5 domain-separation, audit sample


def _range_audited(exact_sample_hex: str) -> Column:
    """audit_sampled under the range family's seed — the shared
    hard_negatives_ivf sampling discipline."""
    return audit_sampled(RANGE_EXACT_SAMPLE_SEED, exact_sample_hex)


def range_exact_counts(
    spark: SparkSession, sf_dir: str, exact_sample_hex: str | None = None
) -> DataFrame:
    """Per-query exact in-radius counts — the recall denominator shared
    by ivf_range_search and streaming.stream_ivf_range_serve. With
    ``exact_sample_hex`` set (VERDICT r10 ask #2) the brute force runs
    ONLY over the sampled query ids: the query_id predicate pushes
    through range_search's rank window (partition-key predicate) into
    its broadcast query side, so unsampled queries never join the
    corpus scan."""
    base = range_search(spark, sf_dir)
    if exact_sample_hex is not None:
        base = base.filter(_range_audited(exact_sample_hex))
    return base.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )


def range_rank_finish(
    in_range: DataFrame,
    exact_counts: DataFrame,
    exact_sample_hex: str | None = None,
) -> DataFrame:
    """Rank + recall-ledger finishing over (query_id, vec_id, cos)
    in-radius rows — shared VERBATIM by the batch IVF entry and the
    streaming serve twin so the two cannot drift (review r10).

    Whole-query misses are VISIBLE: a query whose in-radius truth lives
    entirely in unprobed cells would otherwise vanish from the output
    (its n_exact denominator never surfacing, so a recall consumer
    summing found/n_exact over the table over-reads); such queries emit
    one sentinel row (neighbor_id = RANGE_MISS_NEIGHBOR, rank 0,
    sim = RANGE_MISS_SIM — an impossible cosine) carrying the real
    n_exact. The oracle applies the identical union.

    With ``exact_sample_hex`` set (the sampled-denominator path —
    exact_counts must have been built with the SAME threshold),
    exact_counts holds only the sampled queries and every unsampled
    query's rows carry n_exact = -1 ("not audited") instead of a fake
    0; sentinel rows can only exist for audited queries by
    construction."""
    n_exact_out = F.coalesce("n_exact", F.lit(0)).cast("long")
    if exact_sample_hex is not None:
        n_exact_out = F.when(
            _range_audited(exact_sample_hex), n_exact_out
        ).otherwise(F.lit(-1).cast("long"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    hits = (
        in_range.withColumn("rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(exact_counts), "query_id", "left")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("sim"),
            n_exact_out.alias("n_exact"),
        )
    )
    missed = (
        exact_counts.join(
            F.broadcast(in_range.select("query_id").distinct()),
            "query_id",
            "left_anti",
        )
        .select(
            "query_id",
            F.lit(RANGE_MISS_NEIGHBOR).cast("long").alias("neighbor_id"),
            F.lit(0).cast("long").alias("rank"),
            F.lit(RANGE_MISS_SIM).alias("sim"),
            F.col("n_exact").cast("long").alias("n_exact"),
        )
    )
    return hits.unionByName(missed)


ORACLE_IVF_RANGE_SEARCH = f"""
WITH {_DUCK_IVF_SCORED_CTES},
in_range AS (
    SELECT query_id, neighbor_id, cos FROM scored WHERE cos >= {RANGE_RADIUS}
),
exact_counts AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
    FROM ({ORACLE_RANGE_SEARCH}) t
    GROUP BY 1
)
SELECT i.query_id, i.neighbor_id,
       CAST(row_number() OVER (PARTITION BY i.query_id ORDER BY i.cos DESC, i.neighbor_id ASC)
            AS BIGINT) AS rank,
       round(i.cos, 6) AS sim,
       COALESCE(x.n_exact, 0) AS n_exact
FROM in_range i LEFT JOIN exact_counts x ON i.query_id = x.query_id
UNION ALL
SELECT x.query_id, CAST({RANGE_MISS_NEIGHBOR} AS BIGINT) AS neighbor_id,
       CAST(0 AS BIGINT) AS rank, CAST({RANGE_MISS_SIM} AS DOUBLE) AS sim,
       x.n_exact
FROM exact_counts x
WHERE x.query_id NOT IN (SELECT query_id FROM in_range)
"""


RANGE_SAMPLE_HEX = "800000"  # registered sampled-audit entry: ~0.5 query rate


def ivf_range_search_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAMPLED-denominator serving shape of ivf_range_search, pinned
    as its own driver hash contract (VERDICT r10 ask #2, the
    hard_negatives_ivf_sampled precedent): served in-radius rows are the
    full IVF result, but the brute-force n_exact recall denominator runs
    only over the deterministic md5-threshold query sample
    (RANGE_SAMPLE_HEX), unsampled queries carrying the -1 "not audited"
    sentinel. This is the plan a real query volume runs — the full-audit
    twin stays as the fixture-scale contract."""
    return ivf_range_search(spark, sf_dir, exact_sample_hex=RANGE_SAMPLE_HEX)


_DUCK_RANGE_AUDITED = _duck_audit_sampled(
    RANGE_EXACT_SAMPLE_SEED, RANGE_SAMPLE_HEX, "{q}"
)

ORACLE_IVF_RANGE_SEARCH_SAMPLED = f"""
WITH {_DUCK_IVF_SCORED_CTES},
in_range AS (
    SELECT query_id, neighbor_id, cos FROM scored WHERE cos >= {RANGE_RADIUS}
),
exact_counts AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
    FROM ({ORACLE_RANGE_SEARCH}) t
    WHERE {_DUCK_RANGE_AUDITED.format(q='query_id')}
    GROUP BY 1
)
SELECT i.query_id, i.neighbor_id,
       CAST(row_number() OVER (PARTITION BY i.query_id ORDER BY i.cos DESC, i.neighbor_id ASC)
            AS BIGINT) AS rank,
       round(i.cos, 6) AS sim,
       CASE WHEN {_DUCK_RANGE_AUDITED.format(q='i.query_id')}
            THEN COALESCE(x.n_exact, 0) ELSE CAST(-1 AS BIGINT) END AS n_exact
FROM in_range i LEFT JOIN exact_counts x ON i.query_id = x.query_id
UNION ALL
SELECT x.query_id, CAST({RANGE_MISS_NEIGHBOR} AS BIGINT) AS neighbor_id,
       CAST(0 AS BIGINT) AS rank, CAST({RANGE_MISS_SIM} AS DOUBLE) AS sim,
       x.n_exact
FROM exact_counts x
WHERE x.query_id NOT IN (SELECT query_id FROM in_range)
"""
