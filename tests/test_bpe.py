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


def test_apply_128_merges_bounded_plan(spark):
    """r5 verdict #7: a real tokenizer's merge list is 30k+ entries; one
    projection chaining a replace per merge grows the plan unboundedly.
    Above ``segment`` merges the encode switches to the vocab-scoped
    segmented path — this pins (a) a 128-merge apply finishes with
    bounded analysis time, (b) its output matches the single-chain path
    exactly, (c) the checkpoint segmentation keeps the executed plan's
    replace-chain depth <= segment."""
    import time

    from mysql_ch_replicator_spark.operators.bpe import apply_bpe_merges

    docs = spark.createDataFrame(
        [(1, "the theme of the band and other anthems"),
         (2, "banana bandana and errands"),
         (3, "zq xw vk")],                       # untouched by any merge
        "doc_id long, text string")
    # 8 real merges + 120 no-op filler merges over glyphs the corpus
    # can't contain (digits never survive the word tokenizer's lowercase
    # alpha runs) — priority order still matters for the real ones
    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"),
              ("b", "an"), ("ban", "an"), ("e", "r"), ("o", "th")]
    merges += [(f"q{i}", f"z{i}") for i in range(120)]
    assert len(merges) == 128

    want = {tuple(r) for r in
            apply_bpe_merges(docs, merges, segment=1000).collect()}

    t0 = time.time()
    got_df = apply_bpe_merges(docs, merges, segment=16)
    got = {tuple(r) for r in got_df.collect()}
    elapsed = time.time() - t0
    assert got == want
    assert elapsed < 60, f"segmented 128-merge apply took {elapsed:.0f}s"
    # no single projection carries more than one segment's replaces:
    # the executed plan ends at the last checkpoint, whose chain depth
    # is the final segment only
    # (AdaptiveSparkPlan.toString prints the initial AND final plan, so
    # each projection's chain appears at most twice)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("replace(") <= 2 * 16
