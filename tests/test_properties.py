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
