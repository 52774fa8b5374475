"""Bigram LM quality filter + DSIR importance weights
(o2g_spark/operators/lmfilter.py).

The cross-engine exactness of every op is pinned by the gate oracles
(scripts/check_oracles.py lm_train lm_score dsir_weights); these
tests pin the SEMANTICS: hand-computed counts and probabilities on a
toy corpus, the add-one normalization identity, OOV behavior,
partitioning-invariance, and the discrimination property the filter
exists for (in-domain docs score better than gibberish).
"""

import math

import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import lmfilter


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def toy(spark):
    # 3 docs; words() lowercases and strips punctuation
    return _docs(
        spark,
        [
            (1, "the cat sat"),
            (2, "the cat ran."),
            (3, "A dog sat!"),
        ],
    )


def test_bigram_events_hand(spark, toy):
    rows = {
        (r.doc_id, r.w1, r.w2)
        for r in lmfilter.bigram_events(toy, "doc_id", "text").collect()
    }
    assert rows == {
        (1, "<s>", "the"), (1, "the", "cat"), (1, "cat", "sat"),
        (2, "<s>", "the"), (2, "the", "cat"), (2, "cat", "ran"),
        (3, "<s>", "a"), (3, "a", "dog"), (3, "dog", "sat"),
    }


def test_bigram_events_empty_and_single(spark):
    df = _docs(spark, [(1, "  ?! "), (2, "Word"), (3, "")])
    rows = [
        (r.doc_id, r.w1, r.w2)
        for r in lmfilter.bigram_events(df, "doc_id", "text").collect()
    ]
    # doc 1 has one token-free symbol run and doc 3 is empty → no rows;
    # a single-word doc yields exactly the BOS event
    assert rows == [(2, "<s>", "word")]


def test_lm_train_hand_counts(spark, toy):
    model = {
        (r.w1, r.w2): (r.c_pair, r.c_ctx, r.p_ppm)
        for r in lmfilter.lm_train(toy, "doc_id", "text").collect()
    }
    # vocab = distinct w2 {the,cat,sat,ran,a,dog} = 6, V = 7
    # c_ctx(<s>)=3, c_ctx(the)=2, c_ctx(cat)=2, c_ctx(a)=1, c_ctx(dog)=1
    assert model[("<s>", "the")] == (2, 3, (3 * 1_000_000) // (3 + 7))
    assert model[("the", "cat")] == (2, 2, (3 * 1_000_000) // (2 + 7))
    assert model[("cat", "sat")] == (1, 2, (2 * 1_000_000) // (2 + 7))
    assert model[("a", "dog")] == (1, 1, (2 * 1_000_000) // (1 + 7))
    assert len(model) == 7  # 7 bigram types ((<s>,the) and (the,cat) repeat)


def test_lm_train_min_count_prunes_not_recounts(spark, toy):
    full = {
        (r.w1, r.w2): r.p_ppm
        for r in lmfilter.lm_train(toy, "doc_id", "text").collect()
    }
    pruned = lmfilter.lm_train(toy, "doc_id", "text", min_count=2).collect()
    assert {(r.w1, r.w2) for r in pruned} == {("<s>", "the"), ("the", "cat")}
    for r in pruned:  # probabilities unchanged by pruning
        assert full[(r.w1, r.w2)] == r.p_ppm


def test_add_one_normalization(spark, toy):
    """Σ_w p(w|ctx) == 1 exactly: Σ observed (c+1) plus one unit for
    each of the (V - observed) unseen types equals c_ctx + V."""
    model = lmfilter.lm_train(toy, "doc_id", "text").collect()
    v = len({r.w2 for r in model} | set()) + 1  # distinct next-words + unk
    by_ctx = {}
    for r in model:
        by_ctx.setdefault(r.w1, []).append(r)
    for ctx, rows in by_ctx.items():
        c_ctx = rows[0].c_ctx
        mass = sum(r.c_pair + 1 for r in rows) + (v - len(rows))
        assert mass == c_ctx + v, ctx


def test_lm_score_oov_exact(spark, toy):
    """A fully-OOV doc scores (n-1)·ln(V) + ln(c_ctx(<s>)+V) — the
    smoothed-unknown floor, reachable with no vocabulary mapping."""
    oov = _docs(spark, [(9, "zz qq ww")])
    row = lmfilter.lm_score(toy, oov, "doc_id", "text").collect()[0]
    v, c_bos = 7, 3
    expected = math.log(c_bos + v) + 2 * math.log(v)
    assert row.n_events == 3
    assert abs(row.nll - round(expected, 4)) < 1e-9
    assert abs(row.nll_per_tok - round(expected / 3, 4)) < 1e-9


def test_lm_score_discriminates(spark):
    train = _docs(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
    )
    probe = _docs(
        spark,
        [
            (100, "the quick brown fox jumps"),
            (101, "fox the jumps dog brown"),  # same words, scrambled order
            (102, "zz qq ww ee rr"),  # gibberish
        ],
    )
    out = {
        r.doc_id: r.nll_per_tok
        for r in lmfilter.lm_score(train, probe, "doc_id", "text").collect()
    }
    # in-domain text scores FAR better than either junk class; note
    # add-one smoothing charges a seen-context/unseen-pair event
    # ln(c_ctx+V) vs the fully-OOV floor ln(V), so scrambled in-domain
    # words (101) legitimately cost MORE than pure gibberish (102) —
    # both sit far above any filter threshold that keeps 100
    assert out[100] < 1.0
    assert out[101] > out[100] + 1.5
    assert out[102] > out[100] + 1.5


def test_lm_score_partitioning_invariant(spark, toy):
    probe = _docs(spark, [(i, "the cat sat on a dog") for i in range(30)])
    a = lmfilter.lm_score(toy, probe, "doc_id", "text")
    b = lmfilter.lm_score(
        toy.repartition(7), probe.repartition(5), "doc_id", "text"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_score_from_model_matches_fresh_training(spark, toy):
    """The persisted-model serving path (lm_score_from_model over an
    unpruned include_vocab snapshot) is bit-identical to scoring
    against fresh training — the exactness the checkpoint lifecycle
    relies on."""
    probe = _docs(
        spark,
        [(i, t) for i, t in enumerate(
            ["the cat sat", "a dog ran fast", "zz qq", "the the the"]
        )],
    )
    model = lmfilter.lm_train(
        toy, "doc_id", "text", min_count=1, include_vocab=True
    )
    assert "v" in model.columns
    fresh = lmfilter.lm_score(toy, probe, "doc_id", "text")
    served = lmfilter.lm_score_from_model(model, probe, "doc_id", "text")
    assert sorted(map(tuple, fresh.collect())) == sorted(
        map(tuple, served.collect())
    )


def test_dsir_prefers_target_like_docs(spark):
    target = _docs(
        spark, [(i, "solar panels convert sunlight into power") for i in range(10)]
    )
    raw = _docs(
        spark,
        [
            (1, "solar panels convert sunlight into power"),
            (2, "buy cheap pills online now win prizes"),
            (3, "solar power panels and sunlight"),
        ],
    )
    out = {
        r.doc_id: (r.n_feats, r.logw)
        for r in lmfilter.dsir_logweights(
            raw, target, "doc_id", "text", buckets=512
        ).collect()
    }
    assert out[1][0] == 6  # n_feats = word count (BOS bigrams)
    assert out[1][1] > out[3][1] > out[2][1]


def test_dsir_partitioning_invariant(spark):
    target = _docs(spark, [(i, "alpha beta gamma delta") for i in range(8)])
    raw = _docs(
        spark,
        [(i, "alpha beta gamma" if i % 2 else "zz qq ww") for i in range(40)],
    )
    a = lmfilter.dsir_logweights(raw, target, "doc_id", "text", buckets=256)
    b = lmfilter.dsir_logweights(
        raw.repartition(9), target.repartition(3), "doc_id", "text", buckets=256
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lm_score_no_python_row_udfs(spark, toy):
    """CLAUDE.md B17: the whole family stays JVM-side — no
    BatchEvalPython in any plan."""
    probe = _docs(spark, [(1, "the cat")])
    for df in (
        lmfilter.lm_train(toy, "doc_id", "text"),
        lmfilter.lm_score(toy, probe, "doc_id", "text"),
        lmfilter.dsir_logweights(probe, toy, "doc_id", "text"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
