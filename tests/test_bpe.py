"""BPE vocabulary induction goldens: the Spark trainer's merge table
must EXACTLY equal an independent pure-Python reference trainer run
on the same corpus (same leftmost-non-overlapping merge rule, same
count-desc/lexicographic tie-break) — the rows-only driver check for
`bpe_vocab_merges` is backed by this pinning (SURVEY.md §5 golden
strategy), and segmentation with the learned table must re-tokenize
consistently with training.
"""

from __future__ import annotations

import re
from collections import Counter

END = "</w>"


def _py_word_freqs(texts, max_word_len=24):
    freqs = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if 0 < len(w) <= max_word_len and re.fullmatch("[a-z]+", w):
                freqs[w] += 1
    return freqs


def _py_bpe(texts, n_merges):
    freqs = _py_word_freqs(texts)
    vocab = {w: list(w) + [END] for w in freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # max count, ties lexicographic on (left, right)
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def test_merge_table_matches_python_reference(spark, sf_small):
    from cricket_analytics_nosql_spark.operators.bpe import bpe_vocab_merges
    from cricket_analytics_nosql_spark.sources.tables import load_table

    texts = [
        r.text
        for r in load_table(spark, sf_small, "documents")
        .select("text")
        .collect()
    ]
    want = _py_bpe(texts, 8)
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.weighted_count)
        for r in bpe_vocab_merges(spark, sf_small).collect()
    ]
    assert got == want


def test_merge_fold_is_leftmost_nonoverlapping(spark):
    """`aaa` under pair (a,a) → [aa, a] — the reference rule."""
    from pyspark.sql import functions as F

    from cricket_analytics_nosql_spark.operators.bpe import _MERGE_FOLD

    out = (
        spark.range(1)
        .select(
            F.expr(
                _MERGE_FOLD.format(col="array('a','a','a')", a="a", b="a", ab="aa")
            ).alias("m")
        )
        .collect()[0]
        .m
    )
    assert out == ["aa", "a"]


def test_segmentation_roundtrip_consistency(spark, sf_small):
    """Segmenting the corpus with the learned table must reproduce
    training's end state: token concatenation restores each word,
    and no adjacent token pair in the output matches any learned
    merge (the table is exhaustively applied)."""
    from pyspark.sql import functions as F

    from cricket_analytics_nosql_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
    )
    from cricket_analytics_nosql_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    table = bpe_train(spark, docs, n_merges=6).collect()
    merges = [(r.left, r.right) for r in table]
    seg = bpe_segment(docs.limit(50), merges)
    rows = seg.select("text", "tokens").collect()
    merge_set = set(merges)
    for r in rows:
        words = [
            w
            for w in re.split(r"\s+", r.text.lower())
            if 0 < len(w) <= 24 and re.fullmatch("[a-z]+", w)
        ]
        assert "".join(r.tokens) == "".join(w + END for w in words)
        for a, b in zip(r.tokens, r.tokens[1:]):
            # pairs spanning a word boundary (a ends with END) are
            # never merge candidates at training time
            if a.endswith(END):
                continue
            assert (a, b) not in merge_set, (a, b)
