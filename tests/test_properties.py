"""Property-based checks of the parity math (hypothesis)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given
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
