"""Unigram-LM tokenizer (operators/unigram.py): Viterbi vs an
independent Python lattice DP, seed-vocab exactness, EM trainer
bounds (the q92 trained-float rule: bounds, never value hashes)."""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators import unigram as U

_SETTINGS = dict(max_examples=6, deadline=None)


def _ref_viterbi(word, vocab, max_piece_len=8, unk=U.UNK_LOGP):
    """Literal lattice DP: best[j] = max over spans (i -> j); spans
    visited sorted by (i, j), strictly-greater keeps the first
    maximum (= smallest i, the longest-piece tie-break)."""
    n = len(word)
    spans = []
    for i in range(n):
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            piece = word[i:j]
            if piece in vocab:
                spans.append((i, j, vocab[piece]))
            elif j == i + 1:
                spans.append((i, j, unk))
    spans.sort()
    best = [0.0] + [float("-inf")] * n
    back = [0] + [-1] * n
    for j in range(1, n + 1):
        for i, jj, lp in spans:
            if jj != j:
                continue
            s = best[i] + lp
            if s > best[j]:
                best[j], back[j] = s, i
    cuts, pos = [], n
    while pos > 0:
        cuts.append((back[pos], pos))
        pos = back[pos]
    cuts.reverse()
    return [word[i:j] for i, j in cuts], best[n]


_word = st.text(alphabet="abcd", min_size=1, max_size=12)


@settings(**_SETTINGS)
@given(words=st.lists(_word, min_size=1, max_size=6, unique=True),
       vocab_words=st.lists(_word, min_size=1, max_size=8))
def test_viterbi_matches_reference(spark, words, vocab_words):
    # deterministic integer-valued logps (adds-only exactness):
    # score = -(1 + len(piece) % 3) — arbitrary but reproducible
    vocab = {}
    for vw in vocab_words:
        for i in range(len(vw)):
            for j in range(i + 1, min(i + 4, len(vw)) + 1):
                p = vw[i:j]
                vocab[p] = float(-(1 + len(p) % 3))
    pieces = spark.createDataFrame(
        list(vocab.items()), "piece string, logp double"
    )
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: (list(r.pieces), r.score)
        for r in U.viterbi_tokenize(wdf, pieces).collect()
    }
    for w in words:
        exp_pieces, exp_score = _ref_viterbi(w, vocab)
        assert got[w][0] == exp_pieces, (w, got[w], exp_pieces)
        assert got[w][1] == pytest.approx(exp_score, abs=0)
        assert "".join(got[w][0]) == w  # round-trip identity


def test_unk_fallback_covers_unknown_chars(spark):
    pieces = spark.createDataFrame(
        [("ab", -1.0), ("a", -2.0), ("b", -2.0)],
        "piece string, logp double",
    )
    wdf = spark.createDataFrame([("axb",)], "w string")
    r = U.viterbi_tokenize(wdf, pieces).collect()[0]
    assert list(r.pieces) == ["a", "x", "b"]
    assert r.score == pytest.approx(-2.0 + U.UNK_LOGP + -2.0)


def test_seed_pieces_exact_counts_and_char_cover(spark):
    words = spark.createDataFrame(
        [("abab", 3), ("ba", 2)], "w string, freq long"
    )
    got = {r.piece: r["count"]
           for r in U.seed_pieces(words, 50).collect()}
    # hand counts: 'a' in abab x2 *3 + ba x1 *2 = 8 ...
    assert got["a"] == 8 and got["b"] == 8
    assert got["ab"] == 6 and got["ba"] == 3 + 2
    assert got["abab"] == 3
    # every char present survives any cap
    small = {r.piece
             for r in U.seed_pieces(words, 3).collect()}
    assert {"a", "b"} <= small


def test_word_length_guard(spark):
    words = spark.createDataFrame(
        [("x" * (U.MAX_WORD_LEN + 1), 1)], "w string, freq long"
    )
    with pytest.raises(Exception, match="MAX_WORD_LEN"):
        U.seed_pieces(words, 10)


def test_train_unigram_bounds_and_roundtrip(spark):
    words = spark.createDataFrame(
        [("hello", 10), ("help", 5), ("hell", 3), ("lowly", 2),
         ("yellow", 4), ("low", 6), ("owl", 2), ("howl", 3)],
        "w string, freq long",
    )
    vocab, lls = U.train_unigram(words, vocab_size=24, n_rounds=3)
    # bounds gate (q92 rule): learning happened, size target reached
    assert lls[-1] > lls[0]
    assert vocab.count() == 24
    segs = U.viterbi_tokenize(words, vocab).collect()
    for r in segs:
        assert "".join(r.pieces) == r.w
    # with room for whole words, frequent words memorize
    by_w = {r.w: list(r.pieces) for r in segs}
    assert by_w["hello"] == ["hello"]


def test_estep_expected_counts_match_reference(spark):
    """Forward/backward posteriors vs a literal Python lattice
    sum-product on one tiny vocab (approx — libm exp/log)."""
    words = spark.createDataFrame([("aa", 2)], "w string, freq long")
    vocab = {"a": math.log(0.5), "aa": math.log(0.25)}
    pieces = spark.createDataFrame(
        list(vocab.items()), "piece string, logp double"
    )
    counts, ll = U._estep(words, pieces, "w", "freq", 8)
    got = {r.piece: r.c for r in counts.collect()}
    # lattice for 'aa': paths a+a (0.25) and aa (0.25); z = 0.5
    # E[a] = 2 paths_with_a * (0.25/0.5) * 2 words = 2*0.5*2 = 2
    # E[aa] = (0.25/0.5) * 2 = 1
    assert got["a"] == pytest.approx(2.0, rel=1e-9)
    assert got["aa"] == pytest.approx(1.0, rel=1e-9)
    assert ll == pytest.approx(2 * math.log(0.5), rel=1e-9)


def test_segmentation_stats_min_token_and_unk_decode(spark):
    pieces = spark.createDataFrame(
        [("ab", 0), ("abc", 0), ("c", 0), ("a", 0), ("b", 0)],
        "piece string, count long",
    ).select("piece")
    words = spark.createDataFrame(
        [("abcab",), ("abxc",), ("xy",)], "w string"
    )
    got = {r.w: (r.n_chars, r.n_pieces, r.n_unk)
           for r in U.segmentation_stats(words, pieces).collect()}
    # abcab: min tokens = abc + ab = 2, no unk
    assert got["abcab"] == (5, 2, 0)
    # abxc: ab + UNK(x) + c = 3 pieces, 1 unk
    assert got["abxc"] == (4, 3, 1)
    # xy: two unks
    assert got["xy"] == (2, 2, 2)


def test_tokenizer_eval_exact_ratios(spark):
    pieces = spark.createDataFrame(
        [("ab",), ("a",), ("b",)], "piece string")
    words = spark.createDataFrame(
        [("abab", 3), ("ax", 1)], "w string, freq long"
    )
    [r] = U.tokenizer_eval(words, pieces).collect()
    # abab -> ab+ab (2 pieces, 0 unk) x3; ax -> a+UNK (2 pieces,
    # 1 unk) x1
    assert r.n_words == 4
    assert r.n_tokens == 3 * 2 + 1 * 2 == 8
    assert r.n_chars == 3 * 4 + 1 * 2 == 14
    assert r.n_unk == 1
    assert r.n_covered == 3
    assert r.fertility == round(8 / 4, 6)
    assert r.chars_per_token == round(14 / 8, 6)
    assert r.unk_rate == round(1 / 8, 6)
    assert r.coverage == round(3 / 4, 6)


def test_eval_ranks_trained_vocab_at_least_seed_chars(spark):
    """Vocabulary-quality sanity: a substring seed vocab must spell
    the corpus in no more tokens than the bare character vocab."""
    words = spark.createDataFrame(
        [("hello", 10), ("help", 5), ("lowly", 2), ("yellow", 4)],
        "w string, freq long",
    )
    seed = U.seed_pieces(words, 30).select("piece")
    chars_only = seed.filter(F.length("piece") == 1)
    [rich] = U.tokenizer_eval(words, seed).collect()
    [bare] = U.tokenizer_eval(words, chars_only).collect()
    assert rich.n_tokens < bare.n_tokens
    assert rich.fertility < bare.fertility
    assert rich.n_unk == bare.n_unk == 0  # chars cover everything


def test_empty_word_raises_loudly(spark):
    """Review regression: an empty word used to crash deep in the DP
    with an opaque INVALID_INDEX_OF_ZERO; the guard must name it."""
    pieces = spark.createDataFrame([("a", -1.0)],
                                   "piece string, logp double")
    wdf = spark.createDataFrame([("a",), ("",)], "w string")
    with pytest.raises(Exception, match="MAX_WORD_LEN"):
        U.viterbi_tokenize(wdf, pieces).collect()


def test_train_unigram_hits_exact_target_on_rich_corpus(spark):
    """Review regression: geometric shrinking alone landed
    ~shrink^n_rounds ABOVE vocab_size (63 for a target of 50); the
    final round must cut exactly to the target."""
    words = spark.createDataFrame(
        [(w, (i % 7) + 1) for i, w in enumerate(
            "the quick brown fox jumps over lazy dog pack my box "
            "with five dozen liquor jugs amazingly few discotheques "
            "provide jukeboxes sphinx of black quartz judge my vow"
            .split())],
        "w string, freq long",
    )
    vocab, lls = U.train_unigram(words, vocab_size=50, n_rounds=3)
    assert vocab.count() == 50
