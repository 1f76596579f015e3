"""Trained NB char-bigram language-ID: the fixed-point log2 is a true
log2 approximation, and on a multi-language fixture with distinctive
orthography the trained model beats the marker-token heuristic — the
r10-verdict "curation-grade replacement" claim, measured."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trx_spark.queries.langid import _LG_FBITS, _LG_ONE, _LG_Q, _LG_TBL, nb_lang_scores
from trx_spark.queries.textdata import lang_argmax, lang_marker_scores


def _l2fix_py(x: int) -> int:
    e = x.bit_length() - 1
    m = (x << _LG_FBITS) >> e
    idx = ((m - _LG_ONE) * _LG_Q) >> _LG_FBITS
    return e * _LG_ONE + _LG_TBL[idx]


def test_fixed_point_log2_accuracy():
    """|L2fix(x)/2^F − log2(x)| ≤ 0.02 bits across magnitudes — far
    under any class-score gap, so the integer argmax ranks like the
    float one would."""
    xs = list(range(1, 2000)) + [10**k for k in range(3, 13)] + [
        (1 << 40) + 12345, (1 << 52) - 7
    ]
    for x in xs:
        err = abs(_l2fix_py(x) / _LG_ONE - math.log2(x))
        assert err <= 0.02, (x, err)


_POOLS = {
    "en": ["morning", "water", "night", "should", "world", "right",
           "thing", "people", "through", "bright"],
    "de": ["schnell", "zeitung", "grundlage", "wissenschaft", "verstehen",
           "gemeinsam", "entwicklung", "schreiben", "zwischen", "deutsch"],
    "es": ["corazon", "cancion", "pequeno", "trabajo", "siempre",
           "ciudad", "desarrollo", "companero", "izquierda", "espanol"],
    "fr": ["beaucoup", "chateau", "travailler", "toujours", "lumiere",
           "cheveux", "developpement", "aujourdhui", "chanteaux", "francais"],
}


def _fixture_docs(spark, n_per_lang=40, words_per_doc=8):
    rows = []
    doc_id = 0
    for lang, pool in _POOLS.items():
        for i in range(n_per_lang):
            words = [
                pool[(i * 7 + j * 3 + i * j) % len(pool)]
                for j in range(words_per_doc)
            ]
            rows.append((doc_id, lang, " ".join(words)))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_trained_beats_heuristic_on_fixture(spark):
    """160 docs in 4 languages whose texts avoid the heuristic's marker
    tokens entirely: the trained NB separates them by orthography
    (sch/ung vs cion vs eau/oux ...) while the marker scorer sees only
    zeros and answers 'und' — the measurable gap between a hand-curated
    keyword table and an in-engine trained model."""
    docs = _fixture_docs(spark)
    scored = nb_lang_scores(docs, ("de", "en", "es", "fr")).collect()
    assert len(scored) == 160
    nb_acc = sum(r["lang"] == r["predicted_lang"] for r in scored) / len(scored)

    toks = F.split(F.col("text"), " ")
    heur = docs.withColumn(
        "predicted_lang", lang_argmax(lang_marker_scores(toks))
    ).collect()
    heur_acc = sum(r["lang"] == r["predicted_lang"] for r in heur) / len(heur)

    assert nb_acc >= 0.95, nb_acc
    assert nb_acc > heur_acc, (nb_acc, heur_acc)


def test_scores_are_integers_and_complete(spark, sf_dir):
    """Gate-shape checks on the real table: every doc row carries all
    five class scores (no NULL from unseen-bigram classes) and the
    prediction is the fixed-precedence argmax of those scores."""
    from trx_spark.queries.langid import _LANGS, lang_id_trained

    rows = lang_id_trained(spark, sf_dir).collect()
    assert rows
    for r in rows:
        scores = {lg: r[f"s_{lg}"] for lg in _LANGS}
        assert all(isinstance(v, int) for v in scores.values()), r
        best = max(scores.values())
        winners = [lg for lg in _LANGS if scores[lg] == best]
        assert r["predicted_lang"] == winners[0], r
