"""Distributed BPE merge training — semantics vs a pure-Python
reference trainer (round-8 verdict item #4).

The operator's correctness rests on the literal-replace encoding: the
pipe-wrapped symbol form must merge adjacent occurrences without
consuming shared boundaries ("a a a a" under merge (a,a) -> [aa, aa],
not [aa, a, a]) and never match inside a longer symbol. The reference
implementation here merges over explicit symbol lists — no string
tricks — so any encoding bug diverges."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.bpe import (
    bpe_encode_count,
    merged_repr,
    repr_symbols,
    train_bpe_merges,
)
from formula1_data_pipeline_spark.operators.text import BPE_REGEX


def _ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Reference BPE: explicit symbol lists, greedy left-to-right
    merge application, (count desc, pair asc) tie-break."""
    import re

    words = Counter()
    for t in texts:
        for w in re.findall(BPE_REGEX, t):
            if "|" not in w:
                words[w] += 1
    reprs = {w: list(w) for w in words}
    out = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in reprs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += words[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        out.append((a, b, cnt))
        for w, syms in reprs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            reprs[w] = merged
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_matches_reference_on_classic_example(spark):
    texts = ["low low low lower lower newest newest newest newest "
             "widest widest"]
    assert train_bpe_merges(_docs(spark, texts), 8) == _ref_train(texts, 8)


def test_adjacent_occurrences_both_merge(spark):
    """The boundary-consumption trap: 'a a a a' under merge (a, a)
    must become [aa, aa] — a shared-delimiter encoding would merge
    once and leave [aa, a, a]."""
    texts = ["aaaa aaaa bbbb"]
    got = train_bpe_merges(_docs(spark, texts), 3)
    assert got == _ref_train(texts, 3)
    # after ONLY the first merge (a, a), both adjacent occurrences in
    # 'aaaa' must have fired; the trained sequence then merges (aa, aa)
    assert got[0][:2] == ("a", "a") and got[2][:2] == ("aa", "aa")
    syms = (
        _docs(spark, texts)
        .select(repr_symbols(
            merged_repr(F.lit("aaaa"), [("a", "a")])).alias("s"))
        .collect()[0]["s"]
    )
    assert syms == ["aa", "aa"]


def test_no_in_symbol_false_matches(spark):
    """After merging (a, b) -> ab, the pair (b, c) must not fire
    inside the string 'abc' unless the SYMBOLS b, c are adjacent —
    a bare-infix encoding matches 'b|c' inside '|ab|c|'."""
    texts = ["xa b xa b xa b ab ab"]
    assert train_bpe_merges(_docs(spark, texts), 5) == _ref_train(texts, 5)


def test_property_random_corpora_match_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(
            st.lists(
                st.text(alphabet="abc", min_size=1, max_size=6),
                min_size=1, max_size=8,
            ).map(" ".join),
            min_size=1, max_size=4,
        ),
        n=st.sampled_from([3, 5]),
    )
    def check(texts, n):
        assert train_bpe_merges(_docs(spark, texts), n) == \
            _ref_train(texts, n)

    check()


def test_trained_vocab_compresses_vs_char_baseline(spark):
    """The recall-style bound the verdict asked for: encoding with
    the trained merges must strictly beat the character baseline,
    and more merges never hurt (token counts monotone non-
    increasing)."""
    texts = ["the merge table the merge table the spark join merge",
             "spark join spark join the table"]
    docs = _docs(spark, texts)
    trained = train_bpe_merges(docs, 8)
    merges = [(a, b) for a, b, _ in trained]

    def total(ms):
        return docs.select(
            F.sum(bpe_encode_count(F.col("text"), ms)).alias("n")
        ).collect()[0]["n"]

    char_baseline = total([])
    counts = [total(merges[:i]) for i in range(len(merges) + 1)]
    assert counts[0] == char_baseline
    assert counts[-1] < char_baseline
    assert all(counts[i + 1] <= counts[i] for i in range(len(counts) - 1))


def test_early_stop_and_delimiter_exclusion(spark):
    # single-char words only (GPT-2 pre-tokens keep leading spaces,
    # so multi-word texts always pair ' ' with the next char — the
    # truly pairless corpus is one one-char word per doc) -> zero
    # merges, loop stops before exhausting its budget
    assert train_bpe_merges(_docs(spark, ["a", "b", "a"]), 4) == []
    # delimiter-containing words are excluded from training, and
    # bpe_encode_count degrades them to char length instead of lying
    docs = _docs(spark, ["x|y x|y x|y zz zz"])
    trained = train_bpe_merges(docs, 2)
    assert all("|" not in a and "|" not in b for a, b, _ in trained)
    n = docs.select(
        bpe_encode_count(F.col("text"), [(a, b) for a, b, _ in trained])
        .alias("n")).collect()[0]["n"]
    # 3x 'x|y' (3 chars) + ' x|y' leading-space handling aside,
    # zz merged to one symbol each
    assert n > 0


def test_tokenize_roundtrip_and_ids(spark):
    """Decoding the token stream reconstructs the document exactly
    (concat of symbols in pos order == concat of pre-tokens), ids are
    dense GPT-style (alphabet first, merges after), and nothing maps
    to -1 on a delimiter-free corpus."""
    from formula1_data_pipeline_spark.operators.bpe import (
        bpe_tokenize,
        build_vocab,
    )

    texts = ["the merge table the merge table", "spark join the table"]
    docs = _docs(spark, texts)
    trained = train_bpe_merges(docs, 6)
    vocab = build_vocab(spark, docs, trained)
    toks = bpe_tokenize(docs, trained, vocab).collect()

    import re

    from formula1_data_pipeline_spark.operators.text import BPE_REGEX
    by_doc = {}
    for r in sorted(toks, key=lambda r: (r["doc_id"], r["pos"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        rows = by_doc[i]
        assert [r["pos"] for r in rows] == list(range(len(rows)))
        assert "".join(r["sym"] for r in rows) == \
            "".join(re.findall(BPE_REGEX, text))
        assert all(r["token_id"] >= 0 for r in rows)

    v = {r["sym"]: r["token_id"] for r in vocab.collect()}
    alpha = sorted(s for s in v if s not in
                   {a + b for a, b, _ in trained})
    assert [v[s] for s in alpha] == list(range(len(alpha)))
    for k, (a, b, _) in enumerate(trained):
        assert v[a + b] == len(alpha) + k


def test_tokenize_delimiter_word_degrades_to_chars(spark):
    from formula1_data_pipeline_spark.operators.bpe import (
        bpe_tokenize,
        build_vocab,
    )

    docs = _docs(spark, ["x|y zz zz"])
    trained = train_bpe_merges(docs, 2)
    vocab = build_vocab(spark, docs, trained)
    rows = sorted(bpe_tokenize(docs, trained, vocab).collect(),
                  key=lambda r: r["pos"])
    # 'x|y' was excluded from training: it tokenizes to raw chars,
    # and '|' (absent from the vocab) maps to -1
    assert [r["sym"] for r in rows[:3]] == ["x", "|", "y"]
    assert rows[1]["token_id"] == -1
    assert rows[0]["token_id"] >= 0 and rows[2]["token_id"] >= 0


def test_tokenize_plan_broadcasts_vocab(spark):
    """Scoring-path plan claim: the vocab attach is a broadcast join
    (the vocab is alphabet + merges — bounded), and tokenization has
    no range partitioning anywhere."""
    from formula1_data_pipeline_spark.operators.bpe import (
        bpe_tokenize,
        build_vocab,
    )

    docs = _docs(spark, ["the merge table the merge", "spark join"])
    trained = train_bpe_merges(docs, 3)
    vocab = build_vocab(spark, docs, trained)
    plan = bpe_tokenize(docs, trained, vocab) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_oracle_replays_early_stopped_training(spark):
    """Round-8 review finding: when training exhausts its pairs before
    n_merges, the Spark trainer returns the short merge list — the
    unrolled-SQL oracle must NOT zero later rounds (its per-round
    replace now LEFT-joins the possibly-empty argmax). Replay a
    degenerate corpus through both and compare."""
    import duckdb
    import pandas as pd

    import formula1_data_pipeline_spark.queries  # noqa: F401 (import order)
    from formula1_data_pipeline_spark.queries_llm import _bpe_train_sql

    texts = ["ab ab ab"]  # 'ab' + 2x ' ab': exhausts after ~3 merges
    trained = train_bpe_merges(_docs(spark, texts), 6)
    assert 0 < len(trained) < 6  # genuinely early-stopped

    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame({"doc_id": range(len(texts)),
                               "text": texts}))
    got = con.execute(_bpe_train_sql(6)).fetchall()
    assert [(r[1], r[2], r[4]) for r in
            sorted(got, key=lambda r: r[0])] == trained


def test_checkpointing_matches_unchained_training(spark):
    """Round-9 verdict item: representation checkpointing every K
    merges must learn EXACTLY the same merge sequence as the
    unchained form, across several checkpoint boundaries, including
    an early stop landing between checkpoints."""
    from formula1_data_pipeline_spark.operators.bpe import (
        train_bpe_merges,
    )

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a hat and a bat and a rat",
        "low lower lowest newer newest wide wider widest",
        "the the the band banned bananas",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])

    plain = train_bpe_merges(docs, 11, checkpoint_every=0)
    for k in (1, 3, 4):
        ck = train_bpe_merges(docs, 11, checkpoint_every=k)
        assert ck == plain, (k, ck, plain)


def test_checkpointing_bounds_plan_depth(spark):
    """The per-round plan must not grow with the merge count. The
    pre-r14 form guaranteed this only via checkpointing (chain depth
    = merges mod K); the r14 fold form bounds it STRUCTURALLY — one
    aggregate-fold replace node whatever the accumulated merges, with
    the pairs in a literal array. The probe inspects the actual
    analyzed plan, not the driver-side merge list; the checkpoint
    machinery's value semantics stay covered by
    test_checkpointing_matches_unchained_training and
    test_resume_from_checkpoint_matches_uninterrupted."""
    from formula1_data_pipeline_spark.operators.bpe import (
        train_bpe_merges,
    )

    texts = ["abcdefgh abcdefgh ijklmnop", "abcd efgh ijkl mnop qrst"] * 4
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])

    depths = []

    def probe(d):
        plan = d._jdf.queryExecution().analyzed().toString()
        depths.append(plan.count("replace("))

    train_bpe_merges(docs, 10, checkpoint_every=3, plan_inspector=probe)
    assert len(depths) >= 8, depths
    assert max(depths) <= 1, depths

    # WITHOUT checkpointing the fold form must still stay flat — the
    # unbounded-chain hazard is closed at the expression level now
    depths.clear()
    train_bpe_merges(docs, 7, checkpoint_every=0, plan_inspector=probe)
    assert max(depths) <= 1, depths


def test_resume_from_checkpoint_matches_uninterrupted(spark):
    """Crash-resume contract: training 6 merges, checkpointing, and
    resuming for 5 more must produce exactly the merges an
    uninterrupted 11-merge run learns — without touching the corpus
    (docs=None on resume). Resume also composes with further
    checkpointing (K=2 crosses boundaries mid-resume)."""
    from formula1_data_pipeline_spark.operators.bpe import (
        checkpoint_words_repr,
        train_bpe_merges,
        word_freqs,
    )

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "low lower lowest newer newest wide wider widest",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])

    plain = train_bpe_merges(docs, 11, checkpoint_every=0)
    first = train_bpe_merges(docs, 6, checkpoint_every=0)
    ck = checkpoint_words_repr(
        word_freqs(docs), [(a, b) for a, b, _ in first])
    more = train_bpe_merges(
        None, 5, checkpoint_every=2,
        resume=(ck, [(a, b) for a, b, _ in first]))
    assert first + more == plain, (first, more, plain)


def test_fold_apply_merges_matches_replace_chain(spark):
    """r14 optimization guard: apply_merges folds one literal pair
    array; the pre-r14 nested-replace chain is the semantic spec —
    both must rewrite every representation identically (order
    matters: an earlier merge can create the pattern a later one
    consumes)."""
    from pyspark.sql import functions as F

    from formula1_data_pipeline_spark.operators.bpe import (
        _initial_repr,
        apply_merges,
        apply_merges_chain,
    )

    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("h", "i")]

    def chain(r):
        for a, b in merges:
            r = F.replace(
                r, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
        return r

    words = spark.createDataFrame(
        [("low",), ("lower",), ("hi",), ("hillow",), ("",), ("xyz",)],
        "w string")
    base = words.select("w", _initial_repr(F.col("w")).alias("r"))
    got = base.select("w", apply_merges(F.col("r"), merges)
                      .alias("out")).collect()
    want = base.select("w", chain(F.col("r")).alias("out")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the corpus-side chain form (r15: bpe_tokenize/bpe_encode_count
    # route per-row work through codegen, not the interpreted fold)
    # must be the same chain, node for node
    got_chain = base.select(
        "w", apply_merges_chain(F.col("r"), merges).alias("out")
    ).collect()
    assert sorted(map(tuple, got_chain)) == sorted(map(tuple, want))


def test_tokenize_uses_codegen_chain_not_fold(spark):
    """r15 optimization guard: the corpus-facing tokenizer must apply
    merges as a codegen'd nested-replace chain, NOT the trainer's
    interpreted aggregate fold — the fold evaluates per posexploded
    word of every document (r14 regression: q98 -16%). The trainer's
    constant-plan bound stays covered by
    test_checkpointing_bounds_plan_depth."""
    from formula1_data_pipeline_spark.operators.bpe import (
        bpe_tokenize,
        build_vocab,
        train_bpe_merges,
    )

    texts = ["low lower lowest", "new newer newest"] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    trained = train_bpe_merges(docs, 4)
    vocab = build_vocab(spark, docs, trained)
    tok = bpe_tokenize(docs, trained, vocab)
    plan = tok._jdf.queryExecution().analyzed().toString()
    assert "replace(replace(" in plan, plan[:2000]
    assert "aggregate(array(struct(" not in plan, plan[:2000]
