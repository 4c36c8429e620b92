"""Invariant tests for operators/bpe.py beyond the oracle-parity gate:
exact equality with a naive reference implementation on a controlled
corpus, determinism under repartitioning, and the textbook
non-increasing-merge-count property on real data."""

from __future__ import annotations

from collections import Counter

from docling_api_spark.operators.bpe import bpe_train
from docling_api_spark.sources.catalog import load

SF_DIR = "/root/testdata/sf0.001"


def _naive_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook reference: argmax pair count with (count desc, p1, p2)
    tie-break, greedy left-to-right merge."""
    vocab = {w: list(w) + ["</w>"] for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += word_freqs[w]
        if not counts:
            break
        (p1, p2), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, p1, p2, p1 + p2, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_matches_naive_reference(spark):
    """The overlap-sensitive cases: repeated-char runs ('aaa' with
    pair (a,a) merges floor(3/2) times) and a merged symbol feeding a
    later merge."""
    words = ["aaab", "aaab", "aab", "banana", "banana", "banana", "bandana"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(words)], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    want = _naive_bpe(Counter(words), 6)
    assert got == want


def test_bpe_word_collapses_to_single_symbol(spark):
    """A frequent short word fully merges into ONE symbol mid-training
    (syms size 1 → the sequence(1,0)-is-descending pitfall): training
    must keep matching the naive reference, drawing later merges from
    the other words instead of emitting out-of-bounds/NULL pairs."""
    words = ["ab"] * 10 + ["xyz"] * 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(words)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, n_merges=5).collect()]
    want = _naive_bpe(Counter(words), 5)
    assert got == want
    # 'ab' really did collapse: its merge chain is steps 1-2
    assert got[0][1:4] == ("a", "b", "ab") and got[1][1:4] == ("ab", "</w>", "ab</w>")


def test_bpe_apply_matches_naive_encoded_vocab(spark):
    """bpe_apply with the learned merges reproduces the naive fold's
    final vocabulary exactly (overlap runs + merged-symbol-feeds-later-
    merge cases included)."""
    from docling_api_spark.operators.bpe import _train_merges, bpe_apply

    words = ["aaab", "aaab", "aab", "banana", "banana", "banana", "bandana", "nan"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(words)], "doc_id long, text string"
    )
    trained, vocab0 = _train_merges(docs, 5, "text")
    vocab0.unpersist()
    merges = [(m[1], m[2]) for m in trained]
    got = {
        r["word"]: (r["freq"], tuple(r["syms"]))
        for r in bpe_apply(docs, merges).collect()
    }

    freqs = Counter(words)
    vocab = {w: list(w) + ["</w>"] for w in freqs}
    for p1, p2 in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    want = {w: (freqs[w], tuple(s)) for w, s in vocab.items()}
    assert got == want


def test_bpe_deterministic_and_counts_non_increasing(spark):
    d = load(spark, SF_DIR, "documents")
    a = [tuple(r) for r in bpe_train(d, n_merges=4).collect()]
    b = [tuple(r) for r in bpe_train(d.repartition(7), n_merges=4).collect()]
    assert a == b
    assert len(a) == 4
    cnts = [r[4] for r in a]
    assert cnts == sorted(cnts, reverse=True)
    for step, p1, p2, merged, _ in a:
        assert merged == p1 + p2
