"""Property-based checks of the parity math (hypothesis)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import example, given
from hypothesis import strategies as st

from flink_gmall_spark.functions.tokenize import _tokenize_py


@given(st.integers(min_value=0, max_value=10**12), st.integers(min_value=1, max_value=10**9))
def test_half_up_integer_identity(num, den):
    """(200*num + den) // (2*den) == round_half_up(100*num/den) — the
    identity both engines' ratio SQL relies on (functions.parity)."""
    got = (200 * num + den) // (2 * den)
    want = int(
        (Decimal(100 * num) / Decimal(den)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )
    assert got == want


@given(st.text(max_size=200))
def test_tokenizer_total_and_deterministic(s):
    """The pinned tokenizer never throws, is deterministic, and emits only
    lowercase alnum runs or CJK bigrams/singletons."""
    a = _tokenize_py(s)
    b = _tokenize_py(s)
    assert a == b
    for tok in a:
        assert tok
        assert tok == tok.lower()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group key
            st.integers(min_value=0, max_value=5),  # distinct-member id
            st.integers(min_value=-(10**6), max_value=10**6),  # value (cents)
        ),
        max_size=60,
    )
)
def test_salted_two_phase_equals_plain_python_model(rows):
    """The salted two-phase rollup's algebra — partial (key, salt) sums
    recombined per key — must equal the straight GROUP BY for ANY data,
    including empty groups and negative values. Modeled in Python with
    the same content-derived salting (hash % buckets) the engine uses."""
    buckets = 4
    phase1: dict[tuple[int, int], tuple[int, int]] = {}
    for k, member, v in rows:
        salt = hash(("m", member)) % buckets
        s, c = phase1.get((k, salt), (0, 0))
        phase1[(k, salt)] = (s + v, c + 1)
    two_phase: dict[int, tuple[int, int]] = {}
    for (k, _), (s, c) in phase1.items():
        ts, tc = two_phase.get(k, (0, 0))
        two_phase[k] = (ts + s, tc + c)
    plain: dict[int, tuple[int, int]] = {}
    for k, _, v in rows:
        s, c = plain.get(k, (0, 0))
        plain[k] = (s + v, c + 1)
    assert two_phase == plain


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # window
            st.integers(min_value=0, max_value=20),  # user
        ),
        max_size=80,
    )
)
def test_two_phase_distinct_equals_set_count(rows):
    """visitor_stats' UV algebra: dropDuplicates((window, user)) then
    SUM(1) per window == |set(users)| per window — for any multiset."""
    dedup = set(rows)
    summed: dict[int, int] = {}
    for w, _ in dedup:
        summed[w] = summed.get(w, 0) + 1
    want = {}
    for w, u in rows:
        want.setdefault(w, set()).add(u)
    assert summed == {w: len(s) for w, s in want.items()}


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # lang
            st.integers(min_value=0, max_value=1000),  # score (x1000 ratio)
        ),
        max_size=60,
    )
)
def test_histogram_quantile_equals_window_rank_model(rows):
    """The adaptive quality filter's histogram plan — keep whole
    score-groups above the boundary, then take (quota - above) smallest
    doc_ids from the single boundary group — must equal the naive
    'row_number <= (7n) DIV 10 over (score desc, doc_id asc)' form for
    ANY distribution, including all-ties and tiny groups (quota 0)."""
    docs = [(i, lang, score) for i, (lang, score) in enumerate(rows)]
    langs = {lang for _, lang, _ in docs}

    # window-rank model (the oracle's form)
    want: set[int] = set()
    for lang in langs:
        group = sorted(
            [(d, s) for d, lg, s in docs if lg == lang],
            key=lambda t: (-t[1], t[0]),
        )
        quota = (7 * len(group)) // 10
        want |= {d for d, _ in group[:quota]}

    # histogram model (the engine's plan)
    got: set[int] = set()
    for lang in langs:
        group = [(d, s) for d, lg, s in docs if lg == lang]
        n = len(group)
        quota = (7 * n) // 10
        hist: dict[int, int] = {}
        for _, s in group:
            hist[s] = hist.get(s, 0) + 1
        cum = 0
        for s in sorted(hist, reverse=True):
            c = hist[s]
            cum += c
            members = sorted(d for d, sc in group if sc == s)
            if cum <= quota:
                got |= set(members)  # whole group kept
            elif cum - c < quota:
                got |= set(members[: quota - (cum - c)])  # boundary take
    assert got == want


def _bpe_merge_fold(symbols: list[str], a: str, b: str) -> list[str]:
    """Mirror of the string-accumulator fold both engines run
    (operators/curation._bpe_merge_expr / the DuckDB list_reduce lambda)."""
    acc = symbols[0]
    for x in symbols[1:]:
        last = acc.rsplit(" ", 1)[-1]
        if last == a and x == b:
            prefix = acc[: len(acc) - len(a) - 1] if len(acc) > len(a) else ""
            acc = (prefix + " " if prefix else "") + a + b
        else:
            acc = acc + " " + x
    return acc.split(" ")


def _bpe_merge_scan(symbols: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping merge (the loop
    form in Sennrich et al.'s original implementation)."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@given(
    st.lists(st.sampled_from(["a", "b", "ab", "aa"]), min_size=1, max_size=12),
    st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("ab", "a"), ("a", "ab")]),
)
def test_bpe_fold_equals_reference_scan(symbols, pair):
    """The string-fold merge (what the Spark aggregate + DuckDB
    list_reduce lambdas compute) must equal the canonical list-scan
    greedy merge for ANY symbol sequence and pair — including pairs
    whose merged symbol re-participates ('a'+'a' -> 'aa' next to 'a')."""
    a, b = pair
    assert _bpe_merge_fold(symbols, a, b) == _bpe_merge_scan(symbols, a, b)


def _chunks(toks: list[str], w: int = 3) -> list[str]:
    return [" ".join(toks[i : i + w]) for i in range(0, max(len(toks), 1), w)] if toks else []


def _intra_dedup(toks: list[str], w: int = 3) -> list[str]:
    out, seen = [], set()
    for c in _chunks(toks, w):
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


@given(st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=40))
def test_intra_doc_dedup_idempotent(toks):
    """The within-doc chunk-dedup algebra (operators.dedup
    intra_doc_transform): applying it to its own output changes nothing.
    Holds because every kept chunk except the final partial has exactly W
    tokens, so re-chunking the reassembled text reproduces the same
    boundaries — the invariant that makes the map-only operator safe to
    re-run over already-cleaned corpora (ingest retries!)."""
    once = _intra_dedup(toks)
    retok = " ".join(once).split()
    twice = _intra_dedup(retok)
    assert twice == once
    assert len(set(once)) == len(once)  # output has no repeats


@given(
    st.integers(min_value=1, max_value=10**4),  # c_ab
    st.integers(min_value=1, max_value=10**6),  # c_a
    st.integers(min_value=1, max_value=10**6),  # c_b
    st.integers(min_value=1, max_value=10**8),  # N
    st.integers(min_value=1, max_value=50),  # replication factor k
)
def test_collocation_lift_replication_invariant(cab, ca, cb, n, k):
    """Integer lift (1000 * c_ab * N) // (c_a * c_b) is EXACTLY invariant
    under corpus replication x k (k² cancels before the floor division) —
    so sharding/duplicating a corpus cannot move collocation scores, the
    determinism the curation_collocations_lift oracle relies on."""
    base = (1000 * cab * n) // (ca * cb)
    repl = (1000 * (k * cab) * (k * n)) // ((k * ca) * (k * cb))
    assert repl == base


@given(
    st.lists(  # codebook: K codewords of D small ints
        st.lists(st.integers(min_value=-8, max_value=8), min_size=4, max_size=4),
        min_size=2,
        max_size=6,
    ),
    st.lists(st.integers(min_value=-8, max_value=8), min_size=4, max_size=4),  # q
    st.lists(st.integers(min_value=-8, max_value=8), min_size=4, max_size=4),  # x
)
def test_pq_adc_own_codes_are_lower_bound(cb, q, x):
    """PQ/ADC algebra (operators.ann): a query's ADC distance to its OWN
    codes is the minimum over any vector's codes — per subspace the
    query's code is its argmin over codewords, so summing per-subspace
    LUT entries of any other code vector can only grow. The property that
    makes ADC ranking sound (the query's duplicate can never be outranked
    by quantization artifacts)."""
    m, sub = 2, 2  # 2 subspaces x 2 dims over the 4-dim toy vectors

    def sq(a, b):
        return sum((ai - bi) ** 2 for ai, bi in zip(a, b))

    def lut(qv, c, mi):
        return sq(qv[mi * sub : (mi + 1) * sub], c[mi * sub : (mi + 1) * sub])

    def codes(v):
        return [min(range(len(cb)), key=lambda j: (lut(v, cb[j], mi), j)) for mi in range(m)]

    adc_self = sum(lut(q, cb[codes(q)[mi]], mi) for mi in range(m))
    adc_x = sum(lut(q, cb[codes(x)[mi]], mi) for mi in range(m))
    assert adc_self <= adc_x


@given(
    st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).map(
            lambda t: (min(t), max(t))
        ).filter(lambda t: t[0] != t[1]),
        max_size=20,
    )
)
def test_degree_orientation_counts_each_triangle_once(edges):
    """The algorithm behind ads.part_triangles, as a pure-Python model:
    orient each edge toward its higher-(degree, id) endpoint, count
    closed wedges (x->y, x->z, y<z, (y,z) an edge) — must equal
    brute-force triple enumeration, each triangle found EXACTLY once
    (at its minimum node in the (deg, id) total order)."""
    from collections import Counter
    from itertools import combinations

    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1

    def lower_first(u, v):
        return (deg[u], u) < (deg[v], v)

    oriented = [(u, v) if lower_first(u, v) else (v, u) for u, v in edges]
    out = {}
    for s, d in oriented:
        out.setdefault(s, []).append(d)
    found = []
    eset = set(edges)
    for x, dsts in out.items():
        for y, z in combinations(sorted(dsts), 2):
            if (min(y, z), max(y, z)) in eset:
                found.append(tuple(sorted((x, y, z))))

    nodes = sorted(deg)
    brute = [
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in eset and (a, c) in eset and (b, c) in eset
    ]
    assert sorted(found) == sorted(brute)  # exactly once each


@given(
    st.lists(
        st.tuples(st.integers(0, 3650), st.integers(1, 40), st.integers(1, 500)),
        min_size=1,
        max_size=60,
    )
)
def test_histogram_quartile_buckets_model(customers):
    """The threshold rule behind ads.rfm_segments_approx, pure-Python:
    t_k = min value whose cumulative count reaches k·n/4; bucket(x) =
    1 + #{k : x > t_k}. Invariants: buckets are in 1..4, MONOTONE in the
    metric, and the count at-or-below t_k is >= k·n/4 (quartile
    coverage)."""
    from collections import Counter

    for metric_idx in range(3):
        vals = sorted(c[metric_idx] for c in customers)
        n = len(vals)
        hist = Counter(vals)
        thresholds = []
        for k in (1, 2, 3):
            cum = 0
            for v in sorted(hist):
                cum += hist[v]
                if 4 * cum >= k * n:
                    thresholds.append(v)
                    break
        assert len(thresholds) == 3
        assert thresholds == sorted(thresholds)  # nondecreasing

        def bucket(x):
            return 1 + sum(1 for t in thresholds if x > t)

        buckets = [bucket(v) for v in vals]
        assert all(1 <= b <= 4 for b in buckets)
        assert buckets == sorted(buckets)  # monotone in the metric
        for k, t in zip((1, 2, 3), thresholds):
            assert 4 * sum(1 for v in vals if v <= t) >= k * n


def _interleave_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_zvalue_interleave_injective_and_locality(a1, b1, a2, b2):
    """The Morton key must be a bijection of (a, b) — two distinct pairs
    never collide (that is what makes the content rewrite lossless-
    sortable) — and agree with the generated SQL's arithmetic model."""
    z1, z2 = _interleave_py(a1, b1), _interleave_py(a2, b2)
    if (a1, b1) == (a2, b2):
        assert z1 == z2
    else:
        assert z1 != z2
    # de-interleave recovers both coordinates exactly
    ra = sum(((z1 >> (2 * i)) & 1) << i for i in range(16))
    rb = sum(((z1 >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (ra, rb) == (a1, b1)


@given(st.lists(st.text(min_size=1, max_size=8), min_size=0, max_size=40),
       st.lists(st.text(min_size=1, max_size=8), min_size=0, max_size=40))
def test_bloom_model_never_false_negative(hold, train):
    """Model of curation.decontaminate_bloom's bit arithmetic: any
    training shingle PRESENT in the holdout must always probe positive
    (false negatives impossible by construction); false positives are
    allowed. Mirrors the md5/position arithmetic the SQL runs."""
    import hashlib as _h

    from flink_gmall_spark.operators.curation import (
        BLOOM_BITS,
        BLOOM_SEEDS,
        BLOOM_WORD_BITS,
    )

    def positions(s: str) -> list[int]:
        return [
            int(_h.md5((seed + s).encode()).hexdigest()[:12], 16) % BLOOM_BITS
            for seed in BLOOM_SEEDS
        ]

    words: dict[int, int] = {}
    for s in hold:
        for p in positions(s):
            w, bit = p // BLOOM_WORD_BITS, p % BLOOM_WORD_BITS
            words[w] = words.get(w, 0) | (1 << bit)

    held = set(hold)
    for s in train:
        hit = all(
            (words.get(p // BLOOM_WORD_BITS, 0) >> (p % BLOOM_WORD_BITS)) & 1
            for p in positions(s)
        )
        if s in held:
            assert hit, s  # no false negative, ever


@given(st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=8))
def test_temperature_quota_bounds_and_monotonicity(ns):
    """curation.mixture_temperature's integer allocation: every quota is
    ≤ the budget (the literal pre-filter's safety condition), the total
    never exceeds the budget, and a strictly larger language never gets
    a smaller quota (α=2 is monotone)."""
    from flink_gmall_spark.operators.curation import TEMP_BUDGET

    den = sum(n * n for n in ns)
    quotas = [(n * n * TEMP_BUDGET) // den for n in ns]
    assert all(0 <= q <= TEMP_BUDGET for q in quotas)
    assert sum(quotas) <= TEMP_BUDGET
    for n1, q1 in zip(ns, quotas):
        for n2, q2 in zip(ns, quotas):
            if n1 > n2:
                assert q1 >= q2


@given(
    st.text(alphabet="ab", min_size=0, max_size=16),
    st.sets(st.text(alphabet="ab", min_size=1, max_size=4), max_size=12),
)
def test_greedy_token_count_matches_oracle_stage_semantics(w, vocab):
    """curation.greedy_token_count must agree with an INDEPENDENT
    re-implementation of the DuckDB oracle's unrolled advance rule
    (adv = COALESCE(max(len(tok) matching at pos), 1)) on arbitrary
    words and vocabularies over a 2-letter alphabet — the two engines'
    greedy semantics are the same function, pinned here without Spark
    or DuckDB in the loop. Also pins the hard bounds: ceil(len/max_tok)
    <= count <= len(w)."""
    import math

    from flink_gmall_spark.operators.curation import greedy_token_count

    max_tok = max((len(t) for t in vocab), default=1)

    # oracle-rule reference: max matching token length, else 1
    pos, n = 0, 0
    while pos < len(w):
        adv = max(
            (len(t) for t in vocab if w[pos : pos + len(t)] == t), default=1
        )
        pos += adv
        n += 1

    got = greedy_token_count(w, vocab, max_tok)
    assert got == n, (w, sorted(vocab), got, n)
    if w:
        assert math.ceil(len(w) / max(max_tok, 1)) <= got <= len(w)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["insert", "update", "delete"]),
            st.sampled_from(["O", "F", "P"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=10**6)),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_cdc_retract_increments_sum_to_latest_image(ops, n_batches):
    """The retract machine's defining invariant, over ARBITRARY op
    sequences and arbitrary contiguous micro-batch splits: summing the
    emitted (dn, dc) increments per status must reproduce the count and
    cents of the key's final surviving image — zero everywhere if the
    last op was a delete — and the state entry must exist iff the key
    survives (deletes reclaim, no tombstone)."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import _cdc_retract_fn
    from tests.test_streaming import _FakeState

    rows = [
        {
            "type": t,
            "status": s if t != "delete" else None,
            "cents": c if t != "delete" else None,
            "op_us": i,
            "op_seq": i,
        }
        for i, (t, s, c) in enumerate(ops)
    ]
    # arbitrary contiguous batch split (delivery stays in op order)
    cut = max(1, len(rows) // n_batches)
    batches = [rows[i : i + cut] for i in range(0, len(rows), cut)]

    st_ = _FakeState()
    sums: dict[str, list[int]] = {}
    for b in batches:
        (out,) = _cdc_retract_fn((1,), iter([pd.DataFrame(b)]), st_)
        for s, dn, dc in zip(out["order_status"], out["dn"], out["dc"]):
            acc = sums.setdefault(s, [0, 0])
            acc[0] += int(dn)
            acc[1] += int(dc)

    # reference: replay the ops sequentially for the surviving image
    alive, status, cents = False, None, 0
    for t, s, c in ops:
        if t == "delete":
            alive = False
        else:
            alive, status, cents = True, s, 0 if c is None else int(c)

    live = {s: acc for s, acc in sums.items() if acc != [0, 0]}
    if alive:
        assert live == {status: [1, cents]}, (ops, sums)
        assert st_.get == (True, status, cents)
    else:
        assert live == {}, (ops, sums)
        assert not st_.exists  # reclaimed, not tombstoned


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=20),  # day_num
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1),  # is_p
                st.one_of(st.none(), st.integers(min_value=0, max_value=999)),
            ),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_rolling_fn_matches_bruteforce_trailing_window(day_rows, n_batches):
    """The bounded-deque rolling machine must reproduce, for every
    emitted day, the brute-force trailing ROLLING_DAYS_S-day aggregate
    over all rows — events and purchases as plain sums, cents with SQL
    SUM semantics (NULL iff every contributing cents is NULL) — under
    the documented delivery shape: days non-decreasing across batches,
    each day's bucket closed within one micro-batch."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import ROLLING_DAYS_S, _rolling_fn
    from tests.test_streaming import _FakeState

    days_sorted = sorted(day_rows)
    cut = max(1, len(days_sorted) // n_batches)
    day_batches = [days_sorted[i : i + cut] for i in range(0, len(days_sorted), cut)]

    st_ = _FakeState()
    got: dict[int, tuple] = {}
    for db in day_batches:
        rows = [
            {"day_num": d, "one": 1, "is_p": p, "cents": c}
            for d in db
            for (p, c) in day_rows[d]
        ]
        (out,) = _rolling_fn((1,), iter([pd.DataFrame(rows)]), st_)
        for d, n, p, c in zip(
            out["day_num"], out["events_7d"], out["purchases_7d"],
            out["value_cents_7d"],
        ):
            got[int(d)] = (int(n), int(p), None if pd.isna(c) else int(c))

    for d in days_sorted:
        window = [
            (p, c)
            for d2 in days_sorted
            if d - (ROLLING_DAYS_S - 1) <= d2 <= d
            for (p, c) in day_rows[d2]
        ]
        non_null = [c for (_, c) in window if c is not None]
        want = (
            len(window),
            sum(p for (p, _) in window),
            sum(non_null) if non_null else None,
        )
        assert got[d] == want, (d, got[d], want)


@given(
    st.lists(
        st.sampled_from([1, 2, 599, 600, 601, 1200, 1800, 1801, 3600]),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=4),
    st.lists(st.floats(min_value=0.0, max_value=1.0), min_size=4, max_size=4),
    st.sampled_from([0, 602, 7200]),
)
def test_t3_jump_out_matches_horizon_oracle_under_any_delivery(
    gaps_s, n_batches, wm_fracs, final_extra_s
):
    """The CEP jump-out machine must emit EXACTLY the horizon-oracle set
    (session starts whose successor is late, plus successor-less starts
    whose event-time timeout the final watermark passed), each at most
    once, REGARDLESS of how the ordered event sequence is cut into
    micro-batches and how far the global watermark advances between them
    (other keys' events — bounded in-contract: a bump never passes the
    next undelivered event). Mirrors ORACLE_JUMP_OUT_STREAM's strict
    `wm_ms > pend_ms + gap_ms + 1` firing rule."""
    import pandas as pd

    from flink_gmall_spark.plans.dwm import JUMP_GAP_US, SESSION_GAP_US
    from flink_gmall_spark.streaming.state import _t3_fn
    from tests.test_streaming import _FakeState

    us_list = []
    cur = 1_000_000_000  # keep event 0 well past wm=0
    for g in gaps_s:
        us_list.append(cur)
        cur += g * 1_000_000
    ids = list(range(len(us_list)))

    cut = max(1, len(us_list) // n_batches)
    batches = [list(zip(ids, us_list))[i : i + cut] for i in range(0, len(us_list), cut)]

    st_ = _FakeState(wm_ms=0)
    emitted: list[int] = []

    def fire_timeout_if_due():
        if st_.timeout_ts is not None and st_.wm_ms > st_.timeout_ts:
            st_.hasTimedOut = True
            st_.timeout_ts = None
            (out,) = _t3_fn((1,), iter([]), st_)
            emitted.extend(int(x) for x in out["event_id"])
            st_.hasTimedOut = False

    for bi, b in enumerate(batches):
        fire_timeout_if_due()
        pdf = pd.DataFrame(
            {"event_id": [e for e, _ in b], "us": [u for _, u in b]}
        )
        (out,) = _t3_fn((1,), iter([pdf]), st_)
        emitted.extend(int(x) for x in out["event_id"])
        # in-contract watermark bump: up to just below the next batch's
        # first event (a global wm never passes an undelivered event)
        lo = max(st_.wm_ms, b[-1][1] // 1000)
        if bi + 1 < len(batches):
            hi = batches[bi + 1][0][1] // 1000 - 1
        else:
            hi = us_list[-1] // 1000 + final_extra_s * 1000
        frac = wm_fracs[bi % len(wm_fracs)]
        st_.wm_ms = max(lo, lo + int(frac * (hi - lo)))
    st_.wm_ms = us_list[-1] // 1000 + final_extra_s * 1000
    fire_timeout_if_due()

    # reference: the horizon oracle over the same sequence
    want = set()
    for i, u in enumerate(us_list):
        is_start = i == 0 or u - us_list[i - 1] > SESSION_GAP_US
        if not is_start:
            continue
        if i + 1 < len(us_list):
            if us_list[i + 1] - u > JUMP_GAP_US:
                want.add(i)
        elif st_.wm_ms > u // 1000 + JUMP_GAP_US // 1000 + 1:
            want.add(i)

    assert len(emitted) == len(set(emitted)), f"duplicate emission: {emitted}"
    assert set(emitted) == want, (gaps_s, n_batches, emitted, want)


@given(
    st.lists(
        st.lists(
            st.one_of(
                st.none(),
                st.integers(min_value=1, max_value=28).map(
                    lambda d: f"2024-01-{d:02d}"
                ),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_cohort_fn_matches_first_day_reference(batches):
    """The O(1) cohort machine, under its ordered-delivery precondition
    (each batch's minimum day >= every prior batch's maximum), must emit
    exactly one row per DISTINCT non-null day, all labeled with the
    global first day, in non-decreasing order — equivalent to the batch
    first-visit cohort over the union of all batches. NULL days never
    pin the cohort nor advance max_day."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import _cohort_fn
    from tests.test_streaming import _FakeState

    # enforce the documented precondition by sorting days ACROSS batches
    # while keeping the given batch sizes (split points preserved)
    all_days = sorted(d for b in batches for d in b if d is not None)
    sizes = [len([d for d in b if d is not None]) for b in batches]
    ordered, pos = [], 0
    for b, sz in zip(batches, sizes):
        days = all_days[pos : pos + sz]
        pos += sz
        nulls = [None] * (len(b) - sz)
        ordered.append(days + nulls)

    st_ = _FakeState()
    got = []
    for b in ordered:
        (out,) = _cohort_fn((1,), iter([pd.DataFrame({"dt": b})]), st_)
        got.extend(zip(out["cohort_day"], out["day"]))

    distinct = sorted(set(all_days))
    if not distinct:
        assert got == []
        assert st_.get == ("", "")
    else:
        want = [(distinct[0], d) for d in distinct]
        assert got == want, (ordered, got, want)
        assert st_.get == (distinct[0], distinct[-1])


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "purchase", "other"]),
            st.integers(min_value=0, max_value=3),  # gap index
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_timed_funnel_fn_matches_reference(events, n_batches):
    """The timed-funnel machine, over arbitrary ordered event sequences
    and micro-batch cuts, must emit 'viewed' exactly once at the first
    view and 'converted' exactly once iff some purchase lands strictly
    after the first view and within the window — the monotone-marker
    contract that keeps the append stream retraction-free."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import (
        TIMED_FUNNEL_WINDOW_S,
        _timed_funnel_fn,
    )
    from tests.test_streaming import _FakeState

    w_us = TIMED_FUNNEL_WINDOW_S * 1_000_000
    gaps = [1, w_us // 2, w_us, w_us + 1]
    rows, cur = [], 1_000_000
    for i, (et, gi) in enumerate(events):
        rows.append({"event_id": i, "us": cur, "event_type": et})
        cur += gaps[gi]

    cut = max(1, len(rows) // n_batches)
    st_ = _FakeState()
    got: list[str] = []
    for i in range(0, len(rows), cut):
        (out,) = _timed_funnel_fn(
            (1,), iter([pd.DataFrame(rows[i : i + cut])]), st_
        )
        got.extend(out["kind"])

    views = [r["us"] for r in rows if r["event_type"] == "view"]
    want = []
    if views:
        fv = views[0]
        want.append("viewed")
        if any(
            r["event_type"] == "purchase" and fv < r["us"] <= fv + w_us
            for r in rows
        ):
            want.append("converted")
    assert got == want, (events, got, want)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "cart", "purchase"]),
            st.sampled_from([1, 10, 1800, 1801, 7200]),  # gap seconds
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=4),
    st.sampled_from([None, 1800]),
)
def test_transitions_fn_matches_lag_reference(events, n_batches, gap_s):
    """The one-tuple transition machine (both twins: unscoped and
    session-gap-scoped), over arbitrary ordered sequences and
    micro-batch cuts, must emit exactly the lag() pairs of the whole
    sequence — consecutive (prev, cur) steps, session-scoped ones only
    when the gap fits — proving cross-batch tail continuity equals the
    batch window."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import _make_transitions_fn
    from tests.test_streaming import _FakeState

    gap_us = None if gap_s is None else gap_s * 1_000_000
    fn = _make_transitions_fn(gap_us)

    rows, cur = [], 1_000_000
    for i, (et, g) in enumerate(events):
        rows.append({"event_id": i, "us": cur, "event_type": et})
        cur += g * 1_000_000

    cut = max(1, len(rows) // n_batches)
    st_ = _FakeState()
    got = []
    for i in range(0, len(rows), cut):
        (out,) = fn((1,), iter([pd.DataFrame(rows[i : i + cut])]), st_)
        got.extend(zip(out["from_type"], out["to_type"]))

    want = [
        (a["event_type"], b["event_type"])
        for a, b in zip(rows, rows[1:])
        if gap_us is None or b["us"] - a["us"] <= gap_us
    ]
    assert got == want, (events, gap_s, got, want)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "cart", "ad_click", "purchase"]),
            st.sampled_from([1, 60, 86400, 86401, 200000]),  # gap seconds
            st.one_of(st.none(), st.integers(min_value=0, max_value=9999)),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_attrib_fn_matches_last_touch_reference(events, n_batches):
    """The last-touch machine, over arbitrary ordered sequences and
    micro-batch cuts, must credit every purchase to the most recent
    non-purchase touchpoint within the attribution window (else
    'direct'), carrying NULL cents as 0 — exactly the batch lag-window
    semantics, across batch boundaries."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import ATTR_WINDOW_S, _attrib_fn
    from tests.test_streaming import _FakeState

    rows, cur = [], 1_000_000
    for i, (et, g, c) in enumerate(events):
        rows.append({"event_id": i, "us": cur, "event_type": et, "cents": c})
        cur += g * 1_000_000

    cut = max(1, len(rows) // n_batches)
    st_ = _FakeState()
    got = []
    for i in range(0, len(rows), cut):
        (out,) = _attrib_fn((1,), iter([pd.DataFrame(rows[i : i + cut])]), st_)
        got.extend(zip(out["channel"], out["cents"]))

    want, touch = [], None
    for r in rows:
        if r["event_type"] == "purchase":
            if (
                touch is not None
                and touch["us"] >= r["us"] - ATTR_WINDOW_S * 1_000_000
            ):
                ch = touch["event_type"]
            else:
                ch = "direct"
            want.append((ch, 0 if r["cents"] is None else r["cents"]))
        else:
            touch = r
    assert [(c, int(v)) for c, v in got] == want, (events, got, want)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=4),
)
def test_t1_fn_first_event_flag_across_batches(n_events, n_batches):
    """T1: exactly the first event ever seen for a key carries is_new=1,
    every later one 0, regardless of micro-batch cuts."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import _t1_fn
    from tests.test_streaming import _FakeState

    rows = [{"event_id": i, "us": 1_000_000 * (i + 1)} for i in range(n_events)]
    cut = max(1, n_events // n_batches)
    st_ = _FakeState()
    got = []
    for i in range(0, n_events, cut):
        (out,) = _t1_fn((1,), iter([pd.DataFrame(rows[i : i + cut])]), st_)
        got.extend(zip(out["event_id"], out["is_new"]))
    assert got == [(i, "1" if i == 0 else "0") for i in range(n_events)]


@given(
    st.lists(
        st.lists(
            st.one_of(
                st.none(),
                st.integers(min_value=1, max_value=28).map(
                    lambda d: f"2024-01-{d:02d}"
                ),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_t2_fn_emits_each_day_once(batches):
    """T2: under ordered delivery (enforced here by sorting days across
    the given batch cuts), every distinct non-null day is emitted
    exactly once, in order — the O(1) last_dt fold equals the batch
    first-visit dedup."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import _t2_fn
    from tests.test_streaming import _FakeState

    all_days = sorted(d for b in batches for d in b if d is not None)
    sizes = [len([d for d in b if d is not None]) for b in batches]
    ordered, pos = [], 0
    for b, sz in zip(batches, sizes):
        days = all_days[pos : pos + sz]
        pos += sz
        ordered.append(days + [None] * (len(b) - sz))

    st_ = _FakeState()
    got = []
    for b in ordered:
        (out,) = _t2_fn((1,), iter([pd.DataFrame({"dt": b})]), st_)
        got.extend(out["dt"])
    assert got == sorted(set(all_days)), (ordered, got)


@given(
    st.lists(  # events: (day 1..8, type 0=view/1=purchase/2=other, cents)
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=10_000),
        ),
        max_size=24,
    ),
    st.lists(  # probes: (day 1..9, delivered early in batch 0?)
        st.tuples(
            st.integers(min_value=1, max_value=9), st.booleans()
        ),
        max_size=8,
    ),
    st.integers(min_value=1, max_value=6),  # micro-batch count
)
def test_pit_gated_fn_matches_batch_pit_on_cleared_prefix(events, probes, n_batches):
    """VERDICT r8 ask #7: the watermark-gated PIT machine, driven over
    ARBITRARY micro-batch cuts of a two-leg (events ⊎ probes) sequence
    under Spark's min-policy watermark — each leg in event-time order,
    but any probe may optionally jump to batch 0 (the misaligned shape
    stream_pit_features_gated stages) — must emit exactly the batch
    point-in-time features (events strictly before the probe day) for
    every probe whose day-start the FINAL global watermark passed, keep
    every other probe pending, and never fire the -1 late-probe
    sentinel: in-contract delivery (per-leg event-time order bounds the
    min-policy watermark by the slower leg) cannot reach the
    contract-violation branch.

    Watermark semantics mirrored from the engine: per-leg wm = max event
    time seen (0s delay), global wm = min of legs (0 for a leg with no
    data yet), advanced at batch BOUNDARIES (batch i sees the watermark
    of data through batch i-1), and event-time timers re-fire the
    machine whenever the advancing watermark passes the re-armed gate."""
    import pandas as pd

    from flink_gmall_spark.streaming.state import _day_start_ms, _pit_gated_fn
    from tests.test_streaming import _FakeState

    def day(n):
        return f"2024-01-{n:02d}"

    # leg event times: events 1h into their day, probes at day midnight
    ev_rows = [
        {
            "kind": 1, "d": day(dn), "o_orderkey": -1,
            "is_view": 1 if t == 0 else 0,
            "is_purchase": 1 if t == 1 else 0,
            "cents": c, "_ts": _day_start_ms(day(dn)) + 3_600_000, "_leg": "e",
        }
        for dn, t, c in sorted(events, key=lambda e: e[0])
    ]
    pr_rows = [
        {
            "kind": 0, "d": day(dn), "o_orderkey": i,
            "is_view": 0, "is_purchase": 0, "cents": 0,
            "_ts": _day_start_ms(day(dn)), "_leg": "p", "_early": early,
        }
        for i, (dn, early) in enumerate(sorted(probes, key=lambda p: p[0]))
    ]
    # merge by ts (probes first on ties: a probe at midnight precedes the
    # day's events); early probes jump to the head of batch 0
    head = [r for r in pr_rows if r["_early"]]
    rest = sorted(
        ev_rows + [r for r in pr_rows if not r["_early"]],
        key=lambda r: (r["_ts"], r["_leg"] == "e", r["o_orderkey"]),
    )
    seq = head + rest
    cut = max(1, -(-len(seq) // n_batches)) if seq else 1
    batches = [seq[i : i + cut] for i in range(0, len(seq), cut)] or [[]]

    state = _FakeState()
    emitted: dict[int, tuple] = {}

    def run(batch_rows, wm, timed_out):
        state.wm_ms = wm
        state.hasTimedOut = timed_out
        if timed_out:
            state.timeout_ts = None
            it = iter([])
        else:
            it = iter([pd.DataFrame(batch_rows)[[
                "kind", "d", "o_orderkey", "is_view", "is_purchase", "cents",
            ]]])
        (out,) = _pit_gated_fn((1,), it, state)
        for r in out.itertuples(index=False):
            assert r.views_before != -1, "late-probe sentinel fired in-contract"
            assert r.o_orderkey not in emitted, "probe answered twice"
            emitted[int(r.o_orderkey)] = (
                int(r.views_before), int(r.purchases_before),
                int(r.value_cents_before),
            )

    ev_wm = pr_wm = 0
    for b in batches:
        wm = min(ev_wm, pr_wm)
        if state.timeout_ts is not None and state.timeout_ts <= wm:
            run([], wm, True)
        if b:
            run(b, wm, False)
        for r in b:
            if r["_leg"] == "e":
                ev_wm = max(ev_wm, r["_ts"])
            else:
                pr_wm = max(pr_wm, r["_ts"])
    final_wm = min(ev_wm, pr_wm)
    while state.timeout_ts is not None and state.timeout_ts <= final_wm:
        run([], final_wm, True)

    want = {
        r["o_orderkey"]: (
            sum(e["is_view"] for e in ev_rows if e["d"] < r["d"]),
            sum(e["is_purchase"] for e in ev_rows if e["d"] < r["d"]),
            sum(e["cents"] for e in ev_rows if e["d"] < r["d"]),
        )
        for r in pr_rows
        if _day_start_ms(r["d"]) < final_wm
    }
    assert emitted == want, (events, probes, n_batches, emitted, want)


def test_prefix_filter_bounds_are_safe_and_tight():
    """Pure-math invariant for BOTH prefix-filter bounds (containment
    and Jaccard): for every n, the integer prefix length p must satisfy
    SAFETY — missing all p probe keys forces the overlap below the
    threshold's minimum (n - p < c_min) — and TIGHTNESS (p-1 would not).
    Also pins the float-expression bug: floor((1-t)*n)+1 computed in
    doubles disagrees with the exact rule at denominator multiples."""
    import math

    from flink_gmall_spark.operators.dedup import (
        CONTAINMENT_DEN,
        CONTAINMENT_NUM,
        JP_ALPHA_DEN,
        JP_ALPHA_NUM,
    )

    float_bug_seen = False
    for num, den in ((CONTAINMENT_NUM, CONTAINMENT_DEN), (JP_ALPHA_NUM, JP_ALPHA_DEN)):
        for n in range(1, 2000):
            c_min = (num * n + den - 1) // den  # ceil(num*n/den), exact
            p = n - c_min + 1
            assert n - p < c_min, (num, den, n)            # safety
            assert p < 1 or n - (p - 1) >= c_min, (num, den, n)  # tightness
            # the old double expression, for the containment constants
            if (num, den) == (CONTAINMENT_NUM, CONTAINMENT_DEN):
                p_float = math.floor((1.0 - num / den) * n) + 1
                if p_float != p:
                    float_bug_seen = True
                    assert n % den == 0, n  # bug bites exactly at multiples
    assert float_bug_seen  # the regression the integer rule exists for


@given(st.integers(min_value=1, max_value=100_000))
def test_chunk_spec_arithmetic_reference(n_tok):
    """The integer chunk-spec rule vs a pure-Python reference chunker
    (walk starts by stride, last chunk short): identical start/len
    lists for every n, every chunk non-empty and window-bounded, tail
    reaches the document end, consecutive chunks overlap by exactly
    width - stride except the tail."""
    from flink_gmall_spark.operators.curation import CHUNK_STRIDE, CHUNK_TOKENS

    W, S = CHUNK_TOKENS, CHUNK_STRIDE
    n_starts = 1 if n_tok <= W else 1 + -(-(n_tok - W) // S)
    spec = [(i * S, min(W, n_tok - i * S)) for i in range(n_starts)]

    # reference: walk forward until a window reaches the end
    ref, start = [], 0
    while True:
        ln = min(W, n_tok - start)
        ref.append((start, ln))
        if start + W >= n_tok:
            break
        start += S
    assert spec == ref, (n_tok, spec, ref)
    for s_, ln in spec:
        assert 1 <= ln <= W and s_ + ln <= n_tok
    assert spec[-1][0] + spec[-1][1] == n_tok


@given(st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=50))
def test_padding_waste_reference(token_counts):
    """The ledger arithmetic vs a per-document reference: bucketed pad,
    naive pad, and truncation summed by hand must equal the grouped
    ledger, and total tokens + truncation must equal the raw mass."""
    from flink_gmall_spark.operators.curation import LEN_BUCKET, MAX_SEQ_LEN

    ref: dict[int, list] = {}
    for n in token_counts:
        eff = min(n, MAX_SEQ_LEN)
        trunc = max(n - MAX_SEQ_LEN, 0)
        bucket = ((eff + LEN_BUCKET - 1) // LEN_BUCKET) * LEN_BUCKET
        row = ref.setdefault(bucket, [0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += eff
        row[2] += bucket - eff
        row[3] += MAX_SEQ_LEN - eff
        row[4] += trunc
    assert sum(r[1] + r[4] for r in ref.values()) == sum(token_counts)
    for bucket, (docs, toks, padb, padn, trunc) in ref.items():
        assert 0 <= bucket <= MAX_SEQ_LEN
        assert padb <= padn or bucket == MAX_SEQ_LEN  # bucketed never worse
        assert toks + padb == docs * bucket


@given(st.integers(min_value=1, max_value=10**9))
def test_repeat_epochs_arithmetic(tokens):
    """epochs = min(ceil(target/tokens), cap) in pure integers: the
    chosen epochs either meet the target or hit the cap, and one epoch
    fewer would always miss the target (minimality)."""
    from flink_gmall_spark.operators.curation import (
        EPOCH_TARGET_TOKENS,
        MAX_EPOCHS,
    )

    epochs = min((EPOCH_TARGET_TOKENS + tokens - 1) // tokens, MAX_EPOCHS)
    assert 1 <= epochs <= MAX_EPOCHS
    met = tokens * epochs >= EPOCH_TARGET_TOKENS
    assert met or epochs == MAX_EPOCHS
    if epochs > 1:
        assert tokens * (epochs - 1) < EPOCH_TARGET_TOKENS


def _prefix_probe_keys(shingles: set[str], num: int, den: int):
    """Pure-python mirror of containment_prefix_pairs' probe-key rule:
    order by (md5(s), s), keep the first n - ceil(t*n) + 1 where
    ceil(t*n) = (num*n + den - 1) // den in integer arithmetic."""
    import hashlib

    n = len(shingles)
    c_min = (num * n + den - 1) // den
    p = n - c_min + 1
    ordered = sorted(
        shingles, key=lambda s: (hashlib.md5(s.encode()).hexdigest(), s)
    )
    return set(ordered[: max(p, 0)]), c_min


_PPJOIN_THRESHOLDS = [
    (1, 2), (3, 5), (2, 3), (7, 10), (3, 4), (4, 5), (17, 20),
    (9, 10), (19, 20), (1, 1),
]


@given(
    st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
    st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
    st.sampled_from(_PPJOIN_THRESHOLDS),
)
def test_ppjoin_prefix_bound_pairwise_full_recall(a, b, thr):
    """The exactness claim of containment_prefix_pairs (VERDICT r9 ask
    #5): for ANY pair (A, B) with |A∩B|/|A| >= t, the prefix of A —
    the first n - ceil(t*n) + 1 shingles in (md5, s) order — must
    intersect B. Equivalently: if every probe shingle of A misses B,
    the overlap is at most ceil(t*n) - 1 < t*n. Swept over random
    shingle sets and a (num, den) threshold grid including the n-
    multiple-of-den boundary the float form floor((1-t)*n)+1 gets
    wrong."""
    num, den = thr
    A = {f"s{v}" for v in a}
    B = {f"s{v}" for v in b}
    probe, c_min = _prefix_probe_keys(A, num, den)
    assert 1 <= len(probe) <= len(A)  # p >= 1 for any t <= 1
    if len(A & B) >= c_min:  # integer form of containment >= t
        assert probe & B, (
            f"prefix filter missed a qualifying pair: |A|={len(A)} "
            f"overlap={len(A & B)} c_min={c_min} t={num}/{den}"
        )


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=20), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from(_PPJOIN_THRESHOLDS),
)
def test_ppjoin_candidate_generation_covers_all_qualifying_pairs(corpus, thr):
    """Corpus-level mirror of the operator's candidate join: probe rows
    (each doc's prefix) equi-joined against the full shingle index with
    the (n, doc_id) strict orientation. Every pair whose containment —
    measured on the SMALLER side, the operator's orientation — meets t
    must appear as a candidate; ties in n emit exactly once."""
    num, den = thr
    docs = {i: {f"s{v}" for v in s} for i, s in enumerate(corpus)}
    prefixes = {
        i: _prefix_probe_keys(s, num, den)[0] for i, s in enumerate(docs.values())
    }
    cand = set()
    for ia, sa in docs.items():
        for ib, sb in docs.items():
            ordered = (len(sa), ia) < (len(sb), ib)
            if ordered and prefixes[ia] & sb:
                cand.add((ia, ib))
    for ia, sa in docs.items():
        for ib, sb in docs.items():
            if (len(sa), ia) >= (len(sb), ib):
                continue
            overlap = len(sa & sb)
            # qualifying in integer arithmetic: overlap/|A| >= num/den
            if overlap * den >= num * len(sa):
                assert (ia, ib) in cand, (
                    f"candidate join missed ({ia},{ib}): "
                    f"na={len(sa)} overlap={overlap} t={num}/{den}"
                )


def _winnow_fps(tokens: list[str], k: int, w: int) -> set[str]:
    """Pure-python mirror of dedup.winnow_fingerprint_rows: positional
    word-k-gram md5 hex hashes, window-min over w consecutive hashes
    (whole array when shorter), distinct set."""
    import hashlib

    if len(tokens) < k:
        return set()
    hs = [
        hashlib.md5(" ".join(tokens[i : i + k]).encode()).hexdigest()
        for i in range(len(tokens) - k + 1)
    ]
    nw = max(1, len(hs) - w + 1)
    return {min(hs[j : j + w]) for j in range(nw)}


_WTOK = st.sampled_from(["a", "b", "c", "d", "e", "f"])


@given(
    st.lists(_WTOK, max_size=15),
    st.lists(_WTOK, max_size=15),
    st.lists(_WTOK, max_size=15),
    st.lists(_WTOK, max_size=15),
    st.lists(_WTOK, min_size=6, max_size=20),  # shared run >= W + K - 1 = 6
)
def test_winnowing_guarantee_shared_run_yields_shared_fingerprint(
    pre_a, suf_a, pre_b, suf_b, run
):
    """The winnowing detection guarantee (Schleimer et al. SIGMOD'03):
    any two documents sharing a token run of length >= W + K - 1 share
    at least one winnowed fingerprint. The shared run contributes >= W
    consecutive identical k-gram hashes to both docs, so some window
    lies entirely inside the run in each — and a window over the same
    hash multiset selects the same minimum VALUE. Swept over random
    contexts from a tiny alphabet (context k-grams freely collide with
    run k-grams, which only adds shared hashes)."""
    from flink_gmall_spark.operators.dedup import SHINGLE_K, WINNOW_W

    assert WINNOW_W + SHINGLE_K - 1 <= 6
    doc_a = pre_a + run + suf_a
    doc_b = pre_b + run + suf_b
    fa = _winnow_fps(doc_a, SHINGLE_K, WINNOW_W)
    fb = _winnow_fps(doc_b, SHINGLE_K, WINNOW_W)
    assert fa & fb, (doc_a, doc_b)


@given(st.lists(_WTOK, min_size=3, max_size=60))
def test_winnowing_density_and_membership(tokens):
    """Structural invariants of the fingerprint set: non-empty whenever
    the doc has >= K tokens, a subset of the doc's own k-gram hashes,
    and never larger than the window count (the 2/(W+1) density bound's
    hard ceiling)."""
    import hashlib

    from flink_gmall_spark.operators.dedup import SHINGLE_K, WINNOW_W

    fps = _winnow_fps(tokens, SHINGLE_K, WINNOW_W)
    hs = {
        hashlib.md5(" ".join(tokens[i : i + SHINGLE_K]).encode()).hexdigest()
        for i in range(len(tokens) - SHINGLE_K + 1)
    }
    assert fps and fps <= hs
    assert len(fps) <= max(1, len(tokens) - SHINGLE_K + 1 - WINNOW_W + 1)


@given(
    st.integers(min_value=1, max_value=10**9),
    st.data(),
)
def test_simpson_branch_in_range_and_close(n, data):
    """The token-diversity overflow guard: below DIVERSITY_EXACT_MAX_N
    the exact (n²−Σc²)·SCALE DIV n² form is used and every intermediate
    fits int64; above it the divide-early form's error vs the exact
    rational is below the x1m grain (< SCALE/n ≤ 1 at the branch
    point), and its intermediates stay in range for any physically
    representable document (n ≤ 1e9)."""
    from flink_gmall_spark.operators.textstats import (
        DIVERSITY_EXACT_MAX_N,
        DIVERSITY_SCALE,
    )

    # a plausible sum of squared counts: between all-distinct (n) and
    # all-identical (n²)
    sum_sq = data.draw(st.integers(min_value=n, max_value=n * n))
    x = n * n - sum_sq
    if n <= DIVERSITY_EXACT_MAX_N:
        assert x * DIVERSITY_SCALE < 2**63
        got = (x * DIVERSITY_SCALE) // (n * n)
    else:
        q = x // n
        assert q * DIVERSITY_SCALE < 2**63  # q <= n <= 1e9
        got = (q * DIVERSITY_SCALE) // n
        exact = x * DIVERSITY_SCALE // (n * n)  # python bigint truth
        assert abs(got - exact) <= DIVERSITY_SCALE // n + 1
    assert 0 <= got <= DIVERSITY_SCALE


def _ntile_sizes(n: int, s: int) -> list[int]:
    """SQL-standard NTILE stage sizes: the first n % s stages take the
    extra row."""
    big = n % s
    return [n // s + 1] * big + [n // s] * (s - big)


@given(st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=250))
@example([7] * 97)  # TOTAL tie: one score value spans every stage boundary
@example([1] * 96 + [0])  # near-total tie, n % S != 0
def test_curriculum_distributed_rank_equals_ntile_under_skew(scores):
    """VERDICT r10 ask #4 (skew guard): curriculum_stages' histogram
    stage assignment — grank = (docs with a higher score) + (doc_id rank
    within the score) pushed through the CASE boundary formula — equals
    sequential NTILE bucketing over (score DESC, doc_id) for ANY score
    multiset, INCLUDING the degenerate all-one-score corpus where the
    in-score rank window holds the entire corpus (the skew case SCALE.md
    bounds). The tiny 0..3 domain forces heavy ties by construction."""
    from collections import Counter

    from flink_gmall_spark.operators.curation import CURRICULUM_STAGES as S

    docs = list(enumerate(scores))  # (doc_id, score), doc_id unique
    n = len(docs)
    order = sorted(docs, key=lambda p: (-p[1], p[0]))
    expected = {}
    pos = 0
    for stage, size in enumerate(_ntile_sizes(n, S), start=1):
        for _ in range(size):
            if pos < n:
                expected[order[pos][0]] = stage
                pos += 1
    hist = Counter(sc for _, sc in docs)
    cum_before, run = {}, 0
    for sc in sorted(hist, reverse=True):
        cum_before[sc] = run
        run += hist[sc]
    by_score: dict[int, list[int]] = {}
    for d, sc in docs:
        by_score.setdefault(sc, []).append(d)
    big, size_big, size_small = n % S, n // S + 1, max(n // S, 1)
    got = {}
    for sc, ds in by_score.items():
        for rk, d in enumerate(sorted(ds), start=1):
            grank = cum_before[sc] + rk
            if grank <= big * size_big:
                got[d] = 1 + (grank - 1) // size_big
            else:
                got[d] = 1 + big + (grank - big * size_big - 1) // size_small
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # source
            st.integers(min_value=0, max_value=3),  # score (heavy ties)
        ),
        min_size=1,
        max_size=200,
    )
)
@example([(0, 5)] * 60)  # one source, total tie: every gap is 0
def test_preference_distributed_rank_pairs_equal_textbook(rows):
    """VERDICT r10 ask #4 (skew guard), preference_pairs side: the
    per-source histogram rank + nested pairing + conditional-aggregate
    fold equals the textbook row_number pairing for any (source, score)
    multiset, including all-tied sources (whole source in one
    (source, score) rank window; zero-gap pairs must all drop)."""
    from collections import defaultdict

    from flink_gmall_spark.operators.curation import PREF_MIN_GAP

    docs = [(i, src, sc) for i, (src, sc) in enumerate(rows)]
    by_src = defaultdict(list)
    for d, src, sc in docs:
        by_src[src].append((d, sc))
    expected = set()
    for src, items in by_src.items():
        order = sorted(items, key=lambda p: (-p[1], p[0]))
        n = len(order)
        for rk in range(1, n // 2 + 1):
            (cd, cs), (rd, rs) = order[rk - 1], order[n - rk]
            if cs - rs >= PREF_MIN_GAP:
                expected.add((src, rk, cd, rd, cs - rs))
    got = set()
    for src, items in by_src.items():
        n = len(items)
        hist = defaultdict(int)
        for _, sc in items:
            hist[sc] += 1
        cum_before, run = {}, 0
        for sc in sorted(hist, reverse=True):
            cum_before[sc] = run
            run += hist[sc]
        by_score = defaultdict(list)
        for d, sc in items:
            by_score[sc].append(d)
        half: dict[int, dict] = defaultdict(dict)
        for sc, ds in by_score.items():
            for rk, d in enumerate(sorted(ds), start=1):
                grank = cum_before[sc] + rk
                pair_id = min(grank, n + 1 - grank)
                if 2 * grank < n + 1:
                    half[pair_id]["chosen"] = (d, sc)
                elif 2 * grank > n + 1:
                    half[pair_id]["rejected"] = (d, sc)
        for pair_id, sides in half.items():
            if "chosen" in sides and "rejected" in sides:
                (cd, cs), (rd, rs) = sides["chosen"], sides["rejected"]
                if cs - rs >= PREF_MIN_GAP:
                    got.add((src, pair_id, cd, rd, cs - rs))
    assert got == expected


@given(
    st.integers(min_value=1, max_value=50),  # tf
    st.integers(min_value=1, max_value=1000),  # df
    st.integers(min_value=1, max_value=500),  # dl
    st.integers(min_value=1, max_value=100_000),  # n_docs (>= df enforced)
    st.integers(min_value=1, max_value=10_000_000),  # total_len (>= dl enforced)
)
def test_bm25_score_template_duckdb_equals_python_mirror(
    tf, dfv, dl, n_docs, total_len
):
    """The BM25 parity contract, property-tested CROSS-ENGINE: the shared
    bm25_score_sql template evaluated by DuckDB on arbitrary feature
    values equals the pure-python IEEE-double mirror bit-for-bit (same
    op order, floor-scale included). This pins the 'no transcendentals,
    correctly-rounded ops in written order' argument on actual values
    instead of only the fixture corpora — if either engine's literal
    parsing or op grouping ever drifted from the mirror, a random
    example breaks here before the driver hash does."""
    import math

    import duckdb

    from flink_gmall_spark.operators.retrieval import (
        BM25_SCALE,
        BM25_SWEEP,
        bm25_score_sql,
    )

    n_docs = max(n_docs, dfv)  # df <= n_docs by construction
    total_len = max(total_len, dl, n_docs)  # every doc holds >= 1 token
    con = duckdb.connect()
    for k1x, bx, (k1s, k1p1s, bs, ombs) in BM25_SWEEP:
        got = con.execute(
            f"SELECT {bm25_score_sql(k1s, k1p1s, bs, ombs)} AS s FROM "
            f"(SELECT CAST({tf} AS BIGINT) AS tf, CAST({dfv} AS BIGINT) AS df, "
            f" CAST({dl} AS BIGINT) AS dl, CAST({n_docs} AS BIGINT) AS n_docs, "
            f" CAST({total_len} AS BIGINT) AS total_len)"
        ).fetchone()[0]
        avgdl = float(total_len) / float(n_docs)
        idf = (float(n_docs - dfv) + 0.5) / (float(dfv) + 0.5)
        tf_part = (float(tf) * float(k1p1s)) / (
            float(tf) + float(k1s) * (float(ombs) + (float(bs) * float(dl)) / avgdl)
        )
        want = int(math.floor((idf * tf_part) * float(BM25_SCALE)))
        assert got == want, (k1x, bx, got, want)


@given(
    st.integers(min_value=1, max_value=48),
    st.integers(min_value=1, max_value=999),
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1000, max_value=100_000),
    st.integers(min_value=500_000, max_value=10_000_000),
)
def test_bm25_score_monotonicity(tf, dfv, dl, n_docs, total_len):
    """Ranking semantics of the log-free idf: the per-term score is
    non-decreasing in tf and non-increasing in df — the two monotonicity
    properties BM25's saturation/idf arguments rely on and the module
    docstring claims survive the rational-idf substitution."""
    import math

    def score(tf_, df_):
        avgdl = float(total_len) / float(n_docs)
        idf = (float(n_docs - df_) + 0.5) / (float(df_) + 0.5)
        tf_part = (float(tf_) * 2.2) / (
            float(tf_) + 1.2 * (0.25 + (0.75 * float(dl)) / avgdl)
        )
        return int(math.floor((idf * tf_part) * 1_000_000.0))

    assert score(tf + 1, dfv) >= score(tf, dfv)
    assert score(tf, dfv + 1) <= score(tf, dfv)


@given(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=1, max_value=10_000)),
        st.one_of(st.none(), st.integers(min_value=1, max_value=10_000)),
        st.one_of(st.none(), st.integers(min_value=1, max_value=10_000)),
    ).filter(lambda t: any(r is not None for r in t))
)
def test_wrrf_template_duckdb_equals_python_mirror(ranks):
    """The weighted 3-system RRF template, property-tested CROSS-ENGINE:
    WRRF_SCORE_SQL evaluated by DuckDB over arbitrary (nullable) rank
    triples equals the pure-python mirror bit-for-bit — three
    correctly-rounded divisions added in fixed written order, NULL rank
    contributing exactly 0.0 through the COALESCE idiom. Pins the
    fusion parity on arbitrary ranks instead of only the fixture
    lists (test_rrf_weighted_matches_python)."""
    import duckdb

    from flink_gmall_spark.operators.retrieval import (
        RRF_K,
        WRRF_SCORE_SQL,
        WRRF_WEIGHTS,
    )

    lex, sem, lgx = ranks
    cols = ", ".join(
        f"CAST({'NULL' if r is None else r} AS BIGINT) AS {name}"
        for r, name in ((lex, "lex_rank"), (sem, "sem_rank"), (lgx, "lgx_rank"))
    )
    got = (
        duckdb.connect()
        .execute(f"SELECT {WRRF_SCORE_SQL} AS s FROM (SELECT {cols})")
        .fetchone()[0]
    )
    w_lex, w_sem, w_lgx = (float(w) for w in WRRF_WEIGHTS)
    k = float(RRF_K)
    t1 = w_lex / (k + float(lex)) if lex is not None else 0.0
    t2 = w_sem / (k + float(sem)) if sem is not None else 0.0
    t3 = w_lgx / (k + float(lgx)) if lgx is not None else 0.0
    want = (t1 + t2) + t3
    assert got == want, (ranks, got, want)
