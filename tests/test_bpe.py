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
