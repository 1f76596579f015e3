"""lm_perplexity has no SQL oracle (log2/pow are engine-specific
libm); pin the whole trained model against a pure-Python
implementation (counts exact; the fixed-point log2 sums match to
float tolerance) at sf0.001, plus a discrimination check (natural text scores lower
perplexity than shuffled-vocabulary noise under a model trained on
the natural side)."""

from __future__ import annotations

import math
import re

import pyarrow.parquet as pq
import pytest

from trx_spark.queries.lm import _LM_K, _LM_SCALE, _LM_UNK, _LM_VOCAB, lm_perplexity

_TOKEN_RE = re.compile("[a-z]+")


def _ref_model(docs: dict[int, str]):
    toks = {d: _TOKEN_RE.findall(t) for d, t in docs.items()}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    vocab = {
        w
        for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_LM_VOCAB]
    }
    m = lambda w: w if w in vocab else _LM_UNK  # noqa: E731
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for t in ts:
            uni[m(t)] = uni.get(m(t), 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(m(a), m(b))] = bi.get((m(a), m(b)), 0) + 1
    return toks, m, uni, bi


def _ref_score(ts, m, uni, bi):
    lps = [
        math.floor(
            math.log2(
                (bi.get((m(a), m(b)), 0) + _LM_K)
                / (uni[m(a)] + _LM_K * (_LM_VOCAB + 1))
            )
            * _LM_SCALE
        )
        for a, b in zip(ts, ts[1:])
    ]
    if not lps:
        return None
    avg = sum(lps) / _LM_SCALE / len(lps)
    return len(lps), avg, 2.0 ** (-avg)


def test_matches_reference_model(spark, sf_dir):
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    toks, m, uni, bi = _ref_model(docs)

    got = {r["doc_id"]: r for r in lm_perplexity(spark, sf_dir).collect()}
    expected = {d: _ref_score(ts, m, uni, bi) for d, ts in toks.items()}
    expected = {d: e for d, e in expected.items() if e is not None}
    assert set(got) == set(expected)
    for d, (n, avg, ppl) in expected.items():
        assert got[d]["n_bigrams"] == n
        assert got[d]["avg_log2p"] == pytest.approx(avg, rel=1e-12)
        assert got[d]["perplexity"] == pytest.approx(ppl, rel=1e-12)


def test_noise_scores_higher_perplexity(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lm")
    natural = "the cat sat on the mat and the dog sat on the rug " * 8
    noise = "rug the and mat dog cat on sat the mat rug dog on and cat sat " * 5
    rows = [(1, natural, "s", "en", len(natural)), (2, natural, "s", "en", len(natural)),
            (3, noise, "s", "en", len(noise))]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {r["doc_id"]: r["perplexity"] for r in lm_perplexity(spark, str(d)).collect()}
    assert got[3] > got[1]


def test_surprisal_fix_agrees_with_libm_perplexity(spark, sf_dir):
    """The hash-checkable fixed-point surprisal twin tracks the libm
    lm_perplexity within the log2 table tolerance (≤ 0.02 bits/term):
    avg_surprisal_bits ≈ −avg_log2p on every doc — the cross-check
    that makes the golden-only perplexity gate independently
    corroborated by an oracle-checked query."""
    from trx_spark.queries.lm import lm_perplexity, lm_surprisal_fix

    fx = {r["doc_id"]: r for r in lm_surprisal_fix(spark, sf_dir).collect()}
    pp = {r["doc_id"]: r for r in lm_perplexity(spark, sf_dir).collect()}
    assert set(fx) == set(pp)
    for d in fx:
        assert fx[d]["n_bigrams"] == pp[d]["n_bigrams"]
        assert abs(
            fx[d]["avg_surprisal_bits"] - (-pp[d]["avg_log2p"])
        ) <= 0.02, d
