"""Hand-computed SimHash bit semantics — pins the r16 64-conditional-sum
aggregation (one exchange row per doc) to the vote definition the former
vocab x 64-row explosion implemented: bit j is the sign of the per-position
vote sum over a doc's DISTINCT tokens, votes are 2*bit_j(md5(tok)) - 1 with
j indexing md5's leading 16 hex chars MSB-first, and ties vote '1'.
Independent of the DuckDB oracle, so a shared-SQL bug still fails here."""

from __future__ import annotations

import hashlib
import os

import pandas as pd


def _md5_bits(tok: str) -> list[int]:
    """MSB-first bits of md5(tok)'s leading 16 hex chars — the vote basis."""
    return [
        (int(hashlib.md5(tok.encode()).hexdigest()[:16], 16) >> (63 - j)) & 1
        for j in range(64)
    ]


def _expected_fp(tokens: list[str]) -> str:
    votes = [0] * 64
    for t in set(tokens):
        for j, b in enumerate(_md5_bits(t)):
            votes[j] += 2 * b - 1
    return "".join("1" if v >= 0 else "0" for v in votes)


def test_simhash_hand_computed_votes(spark, tmp_path):
    from flink_gmall_spark.operators import dedup

    rows = [
        # single token: fingerprint IS the token's hash bits
        (1, "hello", "aa", "s", 5),
        # two tokens: sv = 0 wherever bits differ -> tie votes '1' (OR)
        (2, "alpha beta", "aa", "s", 10),
        # three tokens: strict per-bit majority, no ties possible
        (3, "one two three", "aa", "s", 13),
        # repeated token dedups before voting (array_distinct)
        (4, "hello hello HELLO", "aa", "s", 17),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "sh")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        r.doc_id: r.simhash
        for r in dedup.simhash_fingerprints(spark, d).collect()
    }
    assert got[1] == _expected_fp(["hello"])
    assert got[2] == _expected_fp(["alpha", "beta"])
    # the tie rule is observable: differing bit positions read '1'
    ha, hb = _md5_bits("alpha"), _md5_bits("beta")
    assert all(
        got[2][j] == "1" for j in range(64) if ha[j] != hb[j]
    )
    assert got[3] == _expected_fp(["one", "two", "three"])
    # lowercasing + distinct collapse doc 4 to the single-token case
    assert got[4] == got[1]
