"""BPE merge induction: textbook example, greedy within-round semantics,
and determinism of the tie-break."""

from mysql_ch_replicator_spark.operators.bpe import learn_bpe_merges


def _rows(spark, texts, rounds=3):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    return [tuple(r) for r in
            learn_bpe_merges(docs, "text", rounds=rounds)
            .orderBy("round").collect()]


def test_textbook_corpus(spark):
    # low x4, lower, lowest, new, newer, newest — worked example:
    # r1 ties (l,o) and (o,w) at 6, pair-asc picks (l,o); r2 (lo,w);
    # r3 ties (e,w) and (n,e) at 3, picks (e,w). Token counts 31/25/22.
    rows = _rows(spark, ["low low low lower lowest",
                         "new newer newest low"])
    assert rows == [(1, "l", "o", 6, 31),
                    (2, "lo", "w", 6, 25),
                    (3, "e", "w", 3, 22)]


def test_greedy_nonoverlapping_within_round(spark):
    # "aaaa" under merge (a,a) must become [aa, aa] (pairs at 0-1 and
    # 2-3), and "aaa" [aa, a] — the wrapped-separator replace encodes
    # greedy left-to-right BPE exactly.
    rows = _rows(spark, ["aaaa aaa"], rounds=1)
    # r1: pairs (a,a): aaaa has 3 + aaa has 2 = 5
    # after merge: aaaa -> 2 tokens, aaa -> 2 tokens
    assert rows == [(1, "a", "a", 5, 4)]


def test_merged_token_does_not_remerge_same_round(spark):
    # under (a,b): "abab" -> [ab, ab] (4 -> 2 tokens), never [abab]
    rows = _rows(spark, ["abab abab"], rounds=1)
    assert rows[0][1:3] == ("a", "b")
    assert rows[0][4] == 4  # two words x two tokens


def test_deterministic(spark):
    texts = ["the quick brown fox", "the lazy dog", "the the the"]
    assert _rows(spark, texts) == _rows(spark, texts)


def test_apply_bpe_merges_textbook(spark):
    """Encode with a known merge list on a crafted corpus: 'the' under
    [(t,h),(th,e)] collapses to ONE token; merge priority is respected
    (later merges see earlier merges' output); unmerged words keep
    char-count tokens."""
    from mysql_ch_replicator_spark.operators.bpe import apply_bpe_merges

    docs = spark.createDataFrame(
        [(1, "the theme"), (2, "tho")], "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_tokens_bpe)
           for r in apply_bpe_merges(
               docs, [("t", "h"), ("th", "e")]).collect()}
    # 'the' -> [the] (1); 'theme' -> [the, m, e] (3); 'tho' -> [th, o] (2)
    assert got == {1: (2, 4), 2: (1, 2)}
