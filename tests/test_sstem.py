"""Harman S-stemmer: hand-pinned behavior of every rule, exception,
and the only-first-applicable-rule fall-through, via the shared
expression string both engines parse."""

from __future__ import annotations

from pyspark.sql import functions as F

from trx_spark.queries.textquality import _SSTEM_EXPR, sstem_rule_census

_CASES = [
    ("ponies", "pony"),     # rule 1: ies -> y
    ("ties", "ty"),
    ("eies", "eie"),        # rule 1 blocked (eies); rules 2 (ees? no,
                            # 'eies' doesn't end ees)... rule 2 fires: es -> e
    ("classes", "classe"),  # rule 2: es -> e
    ("goes", "goe"),        # rule 2 blocked (oes) -> falls through to rule 3
    ("shoes", "shoe"),      # same fall-through
    ("dogs", "dog"),        # rule 3: drop s
    ("mass", "mass"),       # rule 3 blocked (ss)
    ("bus", "bus"),         # rule 3 blocked (us)
    ("window", "window"),   # no rule applies
    ("y", "y"),
]


def test_hand_pinned_rules(spark):
    df = spark.createDataFrame([(w,) for w, _ in _CASES], "word string")
    got = {
        r.word: r.stem
        for r in df.withColumn(
            "stem", F.expr(_SSTEM_EXPR.format(w="word"))
        ).collect()
    }
    for w, want in _CASES:
        assert got[w] == want, (w, got[w], want)


def test_census_exercises_every_rule(spark, sf_dir):
    rows = {r.suffix: r for r in sstem_rule_census(spark, sf_dir).collect()}
    n = rows[""].n_words  # |vocab| roots per suffix class
    assert rows[""].n_changed == 0 and rows[""].n_folded_to_root == n
    assert rows["s"].n_changed == n and rows["s"].n_folded_to_root == n
    assert rows["es"].n_changed == n and rows["es"].n_folded_to_root == 0
    assert rows["ies"].n_changed == n  # -> root + 'y'
    assert rows["ss"].n_changed == 0  # exception blocks rule 3
    assert rows["us"].n_changed == 0
    assert rows["oes"].n_changed == n  # rule 2 blocked -> rule 3 fires
    assert rows["aies"].n_changed == n  # rule 1 blocked -> rule 2 fires
