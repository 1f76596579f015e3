"""Winnowing fingerprints ≡ a pure-Python reference of the published
algorithm (Schleimer-Wilkerson-Aiken: k-gram hashes, window of w,
rightmost minimal hash per window, distinct selections) — independent
of the SQL oracle, so the Spark and DuckDB forms can't share a bug."""

from __future__ import annotations

import re

from trx_spark.queries.textdata import (
    _P,
    _TOKEN_RE,
    _WINNOW_K,
    _WINNOW_W,
    winnowing_fingerprints,
)

SF = "/root/testdata/sf0.001"


def _tok_hash_py(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % _P
    return h


def _winnow_py(text: str) -> set[tuple[int, int]]:
    toks = re.findall(_TOKEN_RE, text)
    grams = [
        " ".join(toks[i : i + _WINNOW_K])
        for i in range(len(toks) - _WINNOW_K + 1)
    ]
    hs = [_tok_hash_py(g) for g in grams]
    out: set[tuple[int, int]] = set()
    for s in range(len(hs) - _WINNOW_W + 1):
        window = hs[s : s + _WINNOW_W]
        m = min(window)
        rightmost = max(i for i, v in enumerate(window) if v == m)
        out.add((s + rightmost, m))
    return out


def test_matches_python_reference(spark):
    import duckdb  # noqa: F401  (env parity with the oracle tests)

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    want = {
        (d, pos, h) for d, text in docs.items() for pos, h in _winnow_py(text)
    }
    got = {
        (r["doc_id"], r["pos"], r["fp_hash"])
        for r in winnowing_fingerprints(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0


def test_guarantee_and_density():
    """The published guarantee: any shared token run of length
    ≥ k + w − 1 produces at least one common fingerprint HASH; and the
    expected density of selections is ≈ 2/(w+1) of windows."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    a = "one two three " + base + " four five"
    b = "six seven " + base + " eight nine ten"
    fa = {h for _, h in _winnow_py(a)}
    fb = {h for _, h in _winnow_py(b)}
    assert fa & fb, "shared >= k+w-1 run must share a fingerprint"

    def word(n: int) -> str:  # letters only: the tokenizer is [a-z]+
        s = ""
        for _ in range(4):
            s += chr(ord("a") + n % 26)
            n //= 26
        return s

    long_doc = " ".join(word((i * 7919) % 99991) for i in range(2000))
    sel = _winnow_py(long_doc)
    n_windows = (2000 - _WINNOW_K + 1) - _WINNOW_W + 1
    density = len(sel) / n_windows
    assert 0.5 / (_WINNOW_W + 1) < density < 4.0 / (_WINNOW_W + 1)
