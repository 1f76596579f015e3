"""The distributed BPE trainer must reproduce the classic
single-machine algorithm (Sennrich et al. 2016) exactly: same merge
table (order, pairs, counts) and same piece counts, on a corpus where
the expected merges are hand-checkable."""

from __future__ import annotations

import pytest

from trx_spark.queries import bpe


def _ref_bpe(word_freq: dict[str, int], n_merges: int):
    """Pure-Python reference: trains on a word-frequency dict."""
    words = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freq[w]
        if not counts:
            break
        # count DESC, left ASC, right ASC — the trainer's tie-break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


@pytest.fixture(scope="module")
def tiny_corpus(spark, tmp_path_factory):
    """A corpus whose token stream (regex [a-z]+) is fully known."""
    d = tmp_path_factory.mktemp("bpe_sf")
    docs = [
        (1, "low low low low low", "s1", "en", 19),
        (2, "lower lower newest newest newest", "s1", "en", 32),
        (3, "newest newest newest widest widest", "s2", "en", 34),
        (4, "widest low lower newest", "s2", "en", 23),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_merges_match_reference(spark, tiny_corpus):
    freq = {"low": 6, "lower": 3, "newest": 7, "widest": 3}
    ref_merges, ref_words = _ref_bpe(freq, bpe._BPE_MERGES)

    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.bpe_merges(spark, tiny_corpus)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == ref_merges

    enc = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"])
        for r in bpe.bpe_encode(spark, tiny_corpus).collect()
    }
    # doc 1: 5x"low"; piece counts from the reference's final words
    pieces = {w: len(s) for w, s in ref_words.items()}
    assert enc[1] == (5, 5 * pieces["low"])
    assert enc[2] == (5, 2 * pieces["lower"] + 3 * pieces["newest"])
    assert enc[4] == (4, pieces["widest"] + pieces["low"] + pieces["lower"] + pieces["newest"])


def test_merges_boundary_crossing(spark, tmp_path_factory):
    """Merge application must be symbol-aligned: after merging (e,s),
    applying (s,t) to best = [b, es, t] must NOT fuse es+t (a string
    replace of 's<SEP>t' on the joined sequence would — the s it
    matches is the SUFFIX of symbol 'es', not a symbol). Frequencies
    are skewed so round 1 selects (e,s) and round 2 selects (s,t)
    while 'best' holds the crossing-prone [b, es, t] shape."""
    d = tmp_path_factory.mktemp("bpe_boundary")
    docs = [
        (1, "wes wes wes wes", "s1", "en", 15),
        (2, "esq esq esq esq", "s1", "en", 15),
        (3, "sto sto sto sto sto sto sto", "s2", "en", 27),
        (4, "best best best", "s2", "en", 14),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    freq = {"wes": 4, "esq": 4, "sto": 7, "best": 3}
    # precondition: the corpus really exercises the crossing scenario —
    # after round 2 applies (s,t), 'best' must still be [b, es, t]
    # (a boundary-crossing replace yields [b, est], and from there the
    # trained merge tables diverge at rank 6: (b,est) vs (b,es))
    two_merges, two_words = _ref_bpe(freq, 2)
    assert two_merges[0][:2] == ("e", "s")
    assert two_merges[1][:2] == ("s", "t")
    assert two_words["best"] == ["b", "es", "t"]  # NOT ["b", "est"]
    ref_merges, ref_words = _ref_bpe(freq, bpe._BPE_MERGES)
    assert ref_merges[5][:2] == ("b", "es")  # crossing-sensitive rank

    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.bpe_merges(spark, str(d)).orderBy("merge_rank").collect()
    ]
    assert got == ref_merges

    enc = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"])
        for r in bpe.bpe_encode(spark, str(d)).collect()
    }
    assert enc[4] == (3, 3 * len(ref_words["best"]))

    # the DuckDB oracle must implement the identical symbol-aligned fold
    import duckdb

    from tests.oracle_utils import compare_query

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d / 'documents.parquet'}/*.parquet')"
    )
    try:
        compare_query(
            bpe.bpe_merges(spark, str(d)),
            con,
            bpe._MERGES_SQL,
            "bpe_merges_boundary",
        )
        compare_query(
            bpe.bpe_encode(spark, str(d)),
            con,
            bpe._ENCODE_SQL,
            "bpe_encode_boundary",
        )
    finally:
        con.close()


def test_encode_oov_falls_back_to_chars(spark, tmp_path_factory):
    """A word outside the training dictionary costs length(word)
    pieces (with _BPE_VOCAB=256 every word of this corpus is in-vocab,
    so shrink the dict via a direct _train on a 1-word corpus)."""
    d = tmp_path_factory.mktemp("bpe_oov")
    spark.createDataFrame(
        [(1, "aaaa", "s", "en", 4)],
        "doc_id long, text string, source string, lang string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    rows = bpe.bpe_encode(spark, str(d)).collect()
    # "aaaa": merges collapse a␟a -> aa then aa␟aa -> aaaa => 1 piece
    assert rows[0]["n_pieces"] == 1


def test_merge_fold_random_three_way(spark):
    """Randomized three-way equivalence of the symbol-aligned merge
    application: the Spark aggregate expression, the DuckDB
    list_reduce oracle fold, and a pure-Python Sennrich merge must
    agree on 300 random (sequence, pair) cases drawn from a tiny
    alphabet chosen to force boundary-crossing and adjacent-overlap
    shapes (symbols ending in l before symbols starting with r, runs
    of the same symbol, l == r)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    symbols = ["a", "b", "s", "t", "es", "st", "ab", "aa", "a" * 3]

    def py_merge(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    cases = []
    for k in range(300):
        n = rng.randint(1, 8)
        syms = [rng.choice(symbols) for _ in range(n)]
        l, r = rng.choice(symbols), rng.choice(symbols)
        cases.append((k, bpe._SEP.join(syms), l, r,
                      bpe._SEP.join(py_merge(syms, l, r))))

    df = spark.createDataFrame(
        cases, "k long, seq string, l string, r string, want string"
    )
    got = df.select("k", "want", F.expr(bpe._APPLY_MERGE_EXPR).alias("got"))
    bad = got.filter(F.col("got") != F.col("want")).collect()
    assert bad == [], [(r["k"], r["got"], r["want"]) for r in bad[:5]]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cases(k BIGINT, seq VARCHAR, l VARCHAR, r VARCHAR, "
        "want VARCHAR)"
    )
    con.executemany("INSERT INTO cases VALUES (?,?,?,?,?)", cases)
    rows = con.execute("""
        SELECT k, want,
               list_reduce(string_split(seq, chr(31)),
                 (acc, x) -> CASE WHEN x = r AND (acc = l
                               OR ends_with(acc, chr(31) || l))
                             THEN acc || x
                             ELSE acc || chr(31) || x END) AS got
        FROM cases WHERE got IS DISTINCT FROM want
    """).fetchall()
    assert rows == [], rows[:5]


def test_wordpiece_greedy_longest_match(spark):
    """Pin the WordPiece matcher semantics with a crafted vocab:
    longest-match-first (whole word beats any shorter prefix), greedy
    restart after each consumed piece, char fallback, and the
    >_WP_MAXLEN → UNK rule (applied in wordpiece_encode, not the
    fold)."""
    from trx_spark.queries.wordpiece import _WP_MAXLEN, _wp_fold_expr

    vocab = ["un", "unwanted", "want", "wanted", "ed"] + [
        chr(c) for c in range(ord("a"), ord("z") + 1)
    ]
    df = spark.createDataFrame(
        [("unwanted",), ("unwanting",), ("zzz",), ("wantedun",)], ["word"]
    )
    from pyspark.sql import functions as F

    got = {
        r["word"]: r["np"]
        for r in df.withColumn("np", F.expr(_wp_fold_expr(vocab))).collect()
    }
    assert got["unwanted"] == 1  # whole-word piece wins over 'un'
    # un|want|i|n|g: 'unwanted' is not a prefix, 'un' is; then 'want'
    # beats 'w'; 'ing' has no multi-char piece
    assert got["unwanting"] == 5
    assert got["zzz"] == 3  # pure char fallback
    assert got["wantedun"] == 2  # 'wanted' (not 'want') then 'un'
    # a word longer than _WP_MAXLEN never reaches the fold — the query
    # maps it to one UNK piece before the distinct-word filter
    assert _WP_MAXLEN == 20
