"""Unigram-LM tokenizer (round 14) — Python-mirror property tests.

The driver-sim covers Spark↔DuckDB oracle parity; these tests pin the
SEMANTICS against an independent Python reference implementation of the
same deterministic Viterbi-EM (Kudo 2018, hard-EM form): seed counts,
top-N seed selection, floor-scaled log-prob scores, the cost*64+ln
tie-break encoding, backtracking, and the EM count re-estimation.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from flink_gmall_spark.operators import curation as C


def _lnfloor(x: int) -> int:
    return math.floor(math.log(float(x)) * float(C.UNIGRAM_LN_SCALE))


def _py_score(vc: dict[str, int]) -> dict[str, int]:
    tot = sum(vc.values())
    return {p: _lnfloor(c) - _lnfloor(tot) for p, c in vc.items()}


def _py_seed(words: dict[str, int]) -> dict[str, int]:
    ct: Counter = Counter()
    for w, f in words.items():
        for st in range(len(w)):
            for ln in range(1, min(C.UNIGRAM_MAX_PIECE, len(w) - st) + 1):
                ct[w[st : st + ln]] += f
    singles = {p: c for p, c in ct.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in ct.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[: C.UNIGRAM_SEED_MULTI]
    return {**singles, **dict(multis)}


def _py_segment(w: str, score: dict[str, int]) -> list[str]:
    L = len(w)
    dp = [0]
    for i in range(1, L + 1):
        best = None
        for ln in range(1, min(C.UNIGRAM_MAX_PIECE, i) + 1):
            piece = w[i - ln : i]
            if piece in score:
                k = dp[i - ln]
                lnv = ((k % 64) + 64) % 64
                cost = (k - lnv) // 64
                # taint clamp: paths through unreachable prefixes carry
                # the EXACT sentinel (fully-segmentable-or-nothing)
                key = (
                    C.UNIGRAM_NEG_INF
                    if cost <= C.UNIGRAM_TAINT
                    else (cost + score[piece]) * 64 + ln
                )
                if best is None or key > best:
                    best = key
        dp.append(best if best is not None else C.UNIGRAM_NEG_INF)
    pos, pieces = L, []
    while pos > 0:
        lnv = ((dp[pos] % 64) + 64) % 64
        if lnv == 0:  # unreachable position (word not segmentable)
            return []
        pieces.append(w[pos - lnv : pos])
        pos -= lnv
    return pieces


def _py_train(words: dict[str, int]) -> dict[str, int]:
    """Final (piece -> viterbi count) after UNIGRAM_EM_ITERS rounds."""
    vc = _py_seed(words)
    for _ in range(C.UNIGRAM_EM_ITERS):
        score = _py_score(vc)
        nxt: Counter = Counter()
        for w, f in words.items():
            for p in _py_segment(w, score):
                nxt[p] += f
        vc = dict(nxt)
    return vc


CORPUS = [
    # crafted so common stems ("spark", "parse") should win whole-word
    # pieces while rare words fall back to char/bigram segments
    (0, "spark spark spark sparks parse parser parse"),
    (1, "spark stream streams parse sql sql sql"),
    (2, "xylo qzv spark parse parse streamer"),
    (3, "spark sql stream parse ab ab abab"),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    # ONE parquet file (pyarrow), not a Spark directory write: the
    # streaming twin's file source stages table_path as a single-file
    # symlink (jobs._stream_dir), exactly the testdata layout.
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("unigram_sf"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in CORPUS], pa.int64()),
                "text": pa.array([t for _, t in CORPUS], pa.string()),
                "lang": pa.array(["en"] * len(CORPUS), pa.string()),
                "source": pa.array(["t"] * len(CORPUS), pa.string()),
                "n_chars": pa.array(
                    [len(t) for _, t in CORPUS], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def _words() -> dict[str, int]:
    ct: Counter = Counter()
    for _i, t in CORPUS:
        for w in t.split():
            if len(w) >= 2 and w.isalpha() and w.islower():
                ct[w] += 1
    return dict(ct)


def test_unigram_train_matches_python_mirror(spark, corpus_dir):
    words = _words()
    want_ct = _py_train(words)
    want_score = _py_score(want_ct)
    got = {
        r.piece: (r.ct, r.score_x1e6)
        for r in C.unigram_train(spark, corpus_dir).collect()
    }
    want = {p: (c, want_score[p]) for p, c in want_ct.items()}
    assert got == want


def test_unigram_encode_coverage_conserved(spark, corpus_dir):
    """Every dictionary word stays fully segmentable under the trained
    vocabulary: sum over encode of ct * len(piece) == sum over the
    dictionary of freq * len(word) — characters are neither lost nor
    duplicated by the cut."""
    words = _words()
    rows = C.unigram_encode_corpus(spark, corpus_dir).collect()
    got_chars = sum(r.ct * len(r.piece) for r in rows)
    want_chars = sum(f * len(w) for w, f in words.items())
    assert got_chars == want_chars
    # and the per-piece usage matches the mirror's serve-time pass
    score = _py_score(_py_train(words))
    mirror: Counter = Counter()
    mirror_words: dict[str, set] = {}
    for w, f in words.items():
        for p in _py_segment(w, score):
            mirror[p] += f
            mirror_words.setdefault(p, set()).add(w)
    assert {r.piece: (r.ct, r.n_words) for r in rows} == {
        p: (c, len(mirror_words[p])) for p, c in mirror.items()
    }


def test_unigram_fertility_frame(spark, corpus_dir):
    """Fertility ledger sanity on the crafted corpus: one language, both
    token counts >= word count (every word costs >= 1 token), and the
    x1000 ratios reconcile with the sums."""
    (r,) = C.unigram_fertility_vs_bpe(spark, corpus_dir).collect()
    assert r.lang == "en"
    assert r.n_unigram_tokens >= r.n_words
    assert r.n_bpe_tokens >= r.n_words
    assert r.unigram_fertility_x1000 == (1000 * r.n_unigram_tokens) // r.n_words
    assert r.bpe_fertility_x1000 == (1000 * r.n_bpe_tokens) // r.n_words


def test_unigram_train_plan_gate(spark, sf_dir):
    """Scale-shape gate: the whole EM chain is keyed joins + rollups +
    per-row folds — no cartesian/nested-loop join and no Python UDF
    anywhere in the physical plan (the global total is a window over
    the vocabulary-sized count table, not a cross join against the
    corpus)."""
    plan = (
        C.unigram_train(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_unigram_whole_word_pieces_win(spark, corpus_dir):
    """The EM should assign the heavily-repeated stems whole-word pieces
    (that is the POINT of a unigram LM over chars): 'spar'+'k' or a
    single piece covers 'spark' in <= 2 pieces, and every dictionary
    word remains exactly segmentable (joining the reversed pieces
    reconstructs the word). Pins the qualitative behaviour the operator
    exists for, so a future constant tweak that degenerates to
    char-level segmentation fails loudly; mirror agreement with the
    Spark plan is covered by the tests above."""
    words = _words()
    score = _py_score(_py_train(words))
    assert 1 <= len(_py_segment("spark", score)) <= 2
    for w in words:
        ps = _py_segment(w, score)
        assert "".join(reversed(ps)) == w, (w, ps)


def test_unigram_budget_matches_mirror(spark, corpus_dir):
    """Per-doc token accounting under the trained vocabulary — corpus
    words join the segmented dictionary; OOV words cost 1 (the shared
    byte-fallback tier with bpe_token_budget)."""
    words = _words()
    score = _py_score(_py_train(words))
    n_sym = {w: len(_py_segment(w, score)) for w in words}
    want = {}
    for doc_id, t in CORPUS:
        ws = t.split()
        want[doc_id] = (len(ws), sum(n_sym.get(w, 1) for w in ws))
    got = {
        r.doc_id: (r.n_words, r.n_unigram_tokens)
        for r in C.unigram_token_budget(spark, corpus_dir).collect()
    }
    assert got == want


def test_unigram_vocab_sweep_matches_mirror(spark, corpus_dir):
    """The fertility-vs-budget curve: each operating point prunes the
    trained vocabulary to singles + top-K multis by (score desc, piece
    asc), re-segments, and reports coverage + corpus-weighted fertility.
    Coverage is non-decreasing in K (a covered word's path survives any
    vocabulary growth) and the largest K on this tiny corpus keeps every
    multi, so it reproduces full-vocabulary coverage (zero uncovered)."""
    words = _words()
    trained_ct = _py_train(words)
    score = _py_score(trained_ct)
    rows = {
        r.k: r for r in C.unigram_vocab_sweep(spark, corpus_dir).collect()
    }
    assert set(rows) == set(C.UNIGRAM_SWEEP_KS)
    prev_cov = -1
    for k in sorted(C.UNIGRAM_SWEEP_KS):
        singles = {p: s for p, s in score.items() if len(p) == 1}
        multis = sorted(
            ((p, s) for p, s in score.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        vk = {**singles, **dict(multis)}
        n_sym = {w: len(_py_segment(w, vk)) for w in words}
        covered = {w for w, n in n_sym.items() if n > 0}
        n_tok = sum(words[w] * n_sym[w] for w in words)
        cov_freq = sum(words[w] for w in covered)
        r = rows[k]
        assert r.vocab_size == len(vk)
        assert r.n_words == len(words)
        assert r.n_covered == len(covered)
        assert r.n_uncovered == len(words) - len(covered)
        assert r.n_tokens == n_tok
        assert r.fertility_x1000 == (1000 * n_tok) // cov_freq
        assert r.n_covered >= prev_cov
        prev_cov = r.n_covered
    assert rows[max(C.UNIGRAM_SWEEP_KS)].n_uncovered == 0

def test_vocab_sweep_all_uncovered_fertility_is_null(spark):
    """ADVICE r14: an operating point whose pruned vocabulary covers no
    dictionary word must report NULL fertility in BOTH engines — ANSI
    `DIV` would raise on the zero denominator while DuckDB `//` NULLs,
    so the guard is what keeps the engines in lockstep. Pin the guarded
    aggregate expression directly on an all-uncovered rowset, and prove
    the guard is load-bearing (the unguarded form raises in Spark)."""
    import duckdb

    guarded = (
        "CASE WHEN sum(CASE WHEN n_sym > 0 THEN freq ELSE 0 END) = 0"
        " THEN NULL ELSE (1000 * sum(freq * n_sym))"
        " DIV sum(CASE WHEN n_sym > 0 THEN freq ELSE 0 END) END"
    )
    df = spark.createDataFrame(
        [(5, 0), (3, 0)], "freq long, n_sym long"
    )
    assert df.agg(F.expr(guarded).alias("f")).collect()[0].f is None

    unguarded = (
        "(1000 * sum(freq * n_sym))"
        " DIV sum(CASE WHEN n_sym > 0 THEN freq ELSE 0 END)"
    )
    with pytest.raises(Exception):
        df.agg(F.expr(unguarded).alias("f")).collect()

    duck = duckdb.sql(
        """SELECT CASE WHEN sum(CASE WHEN n_sym > 0 THEN freq ELSE 0 END) = 0
                  THEN NULL
                  ELSE (1000 * CAST(sum(freq * n_sym) AS BIGINT))
                    // CAST(sum(CASE WHEN n_sym > 0 THEN freq ELSE 0 END) AS BIGINT)
             END AS f
           FROM (VALUES (5, 0), (3, 0)) t(freq, n_sym)"""
    ).fetchone()
    assert duck[0] is None

def test_stream_unigram_encode_equals_batch(spark, corpus_dir):
    """The ingest-time encode (stateless word/candidate explode +
    broadcast vocab join, drained append-mode; frequency recovered as
    count(*) per candidate row; Viterbi + usage batch-side via the
    SHARED _unigram_dp_finish/_unigram_usage) must be row-identical to
    the batch corpus pass — transport must never change the usage
    table (shared oracle). VERDICT r14 ask #4."""
    from flink_gmall_spark.streaming.jobs import stream_unigram_encode

    served = sorted(map(tuple, stream_unigram_encode(spark, corpus_dir).collect()))
    batch = sorted(map(tuple, C.unigram_encode_corpus(spark, corpus_dir).collect()))
    assert served == batch
    assert len(batch) > 0


def test_stream_unigram_encode_no_python_udf(spark, corpus_dir):
    """Plan gate: no row-at-a-time Python evaluation anywhere on the
    served path (the DP/backtrack are SQL folds; the vocab join is
    broadcast)."""
    from flink_gmall_spark.streaming.jobs import stream_unigram_encode

    plan = (
        stream_unigram_encode(spark, corpus_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
