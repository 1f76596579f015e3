"""The distributed WordPiece trainer must reproduce the classic
likelihood-scored merge loop (Schuster & Nakajima 2012 / the BERT
trainer) exactly: each round merges the pair maximizing
count(ab) / (count(a)·count(b)) over the current segmentation, with
(score DESC, l ASC, r ASC) tie-break — and must DIVERGE from the BPE
count argmax where the statistics say so (rare-but-exclusive pairs
like q·u win on likelihood long before they win on count)."""

from __future__ import annotations

import pytest

from trx_spark.queries import wordpiece


def _ref_wordpiece(word_freq: dict[str, int], n_merges: int):
    """Pure-Python reference trainer on a word-frequency dict."""
    words = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        uc: dict[str, int] = {}
        for w, syms in words.items():
            f = word_freq[w]
            for s in syms:
                uc[s] = uc.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        # score DESC (IEEE double, same arithmetic as both engines),
        # then left ASC, right ASC
        (l, r), cnt = min(
            pc.items(),
            key=lambda kv: (-(kv[1] / (uc[kv[0][0]] * uc[kv[0][1]])), kv[0]),
        )
        merges.append((l, r, cnt, uc[l], uc[r]))
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
    """A corpus whose token stream (regex [a-z]+) is fully known; the
    'qu' words make the likelihood argmax diverge from the count one."""
    d = tmp_path_factory.mktemp("wpt_sf")
    docs = [
        (1, "low low low low low quest quest", "s1", "en", 31),
        (2, "lower lower newest newest newest", "s1", "en", 32),
        (3, "newest newest newest widest widest", "s2", "en", 34),
        (4, "widest low lower newest quest", "s2", "en", 29),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_wordpiece_merges_match_reference(spark, tiny_corpus):
    freq = {"low": 6, "lower": 3, "newest": 7, "widest": 3, "quest": 3}
    ref_merges, ref_words = _ref_wordpiece(freq, wordpiece._WPT_MERGES)

    got = [
        (
            r["left_sym"],
            r["right_sym"],
            r["pair_count"],
            r["left_count"],
            r["right_count"],
        )
        for r in wordpiece.wordpiece_merges(spark, tiny_corpus)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == ref_merges
    # the exclusive pairs (i,d) and (q,u) both score 3/(3·3) = 1/3 —
    # the corpus max — so they take ranks 1–2 under the l-ASC
    # tie-break, even though their counts (3) are far below the count
    # argmax (e,s)=13 that BPE would pick: likelihood ≠ count
    assert [m[:2] for m in got[:2]] == [("i", "d"), ("q", "u")]
    assert got[0][2] == got[0][3]  # pair_count == count(i): exclusive

    # final segmentation piece counts drive the encode path
    from pyspark.sql import functions as F

    _, words = wordpiece._wpt_train(spark, tiny_corpus)
    seg = {
        r["word"]: r["seq"].split("\x1f")
        for r in words.select("word", "seq").collect()
    }
    assert seg == ref_words


def test_wordpiece_score_is_exact_ratio(spark, sf_dir):
    """The hashed double score is exactly pair/(l·r) of the hashed
    integer sufficient statistics (one IEEE division of exact ints)."""
    rows = wordpiece.wordpiece_merges(spark, sf_dir).collect()
    assert len(rows) == wordpiece._WPT_MERGES
    for r in rows:
        assert r["score"] == r["pair_count"] / (
            r["left_count"] * r["right_count"]
        )


def test_wordpiece_trained_encode_bounds(spark, sf_dir):
    """Every doc: n_pieces >= n_tokens (a token is >= 1 piece) and
    n_pieces <= total chars (char fallback is the worst case)."""
    from pyspark.sql import functions as F

    enc = wordpiece.wordpiece_trained_encode(spark, sf_dir)
    bad = enc.filter(
        (F.col("n_pieces") < F.col("n_tokens"))
        | (F.col("pieces_per_token") < 1.0)
    ).count()
    assert bad == 0
    assert enc.count() > 0
