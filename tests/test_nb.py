"""Multinomial naive Bayes (`ml/nb.py`) semantics.

The registry's `nb_langid` query oracle-checks the full arithmetic
chain against DuckDB on the real corpus (whose lang labels are
uncorrelated with text — accuracy there is prior-level by
construction); THESE tests supply the separability evidence on
signal-bearing synthetic data, plus the contract edges the oracle
can't isolate: smoothing of unseen pairs, OOV drop, zero-vocab-doc
exclusion, and the deterministic tiebreak.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timeseries_data_analysis_spark.ml import nb as NB


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_separable_languages_classify_perfectly(spark):
    # two "languages" with disjoint vocabularies, 12 train docs each
    train = []
    for i in range(12):
        train.append((i, "aa bb cc aa bb aa", "xx"))
        train.append((100 + i, "dd ee ff dd ee dd", "yy"))
    test = [(200, "aa cc aa bb", "xx"), (201, "ff dd ee ee", "yy"),
            (202, "bb bb aa", "xx"), (203, "dd dd ff", "yy")]
    train_docs = _docs(spark, train)
    tok = NB.tokenize(train_docs.select("lang", "text"))
    loglik, prior = NB.nb_fit(tok, train_docs.select("lang"), "lang",
                              min_count=5)
    test_docs = _docs(spark, test)
    preds = NB.nb_predict(NB.tokenize(test_docs.select("doc_id", "text")),
                          loglik, prior, "lang")
    got = {r.doc_id: r.pred for r in preds.collect()}
    assert got == {200: "xx", 201: "yy", 202: "xx", 203: "yy"}


def test_laplace_smoothing_and_quantization(spark):
    # one lang never sees token "bb": its loglik must be ln(1/(N_l+V)),
    # 9-dp rounded with the +1e-12 nudge
    train = [(i, "aa aa aa aa aa", "xx") for i in range(3)]
    train += [(10 + i, "aa bb aa bb aa", "yy") for i in range(3)]
    train_docs = _docs(spark, train)
    tok = NB.tokenize(train_docs.select("lang", "text"))
    loglik, _ = NB.nb_fit(tok, train_docs.select("lang"), "lang",
                          min_count=5)
    rows = {(r.token, r.lang): r.loglik for r in loglik.collect()}
    # vocab = {aa (24 occurrences), bb (6)}; V=2
    # xx: N_l = 15 (its aa count; bb unseen) -> unseen bb:
    assert rows[("bb", "xx")] == round(math.log(1 / 17) + 1e-12, 9)
    assert rows[("aa", "xx")] == round(math.log(16 / 17) + 1e-12, 9)
    assert rows[("bb", "yy")] == round(math.log(7 / 17) + 1e-12, 9)


def test_oov_and_zero_vocab_docs_dropped(spark):
    train = [(i, "aa aa aa aa aa", "xx") for i in range(3)]
    train += [(10 + i, "bb bb bb bb bb", "yy") for i in range(3)]
    train_docs = _docs(spark, train)
    tok = NB.tokenize(train_docs.select("lang", "text"))
    loglik, prior = NB.nb_fit(tok, train_docs.select("lang"), "lang",
                              min_count=5)
    # doc 50: one in-vocab token + OOV noise -> scored on aa only;
    # doc 51: ONLY OOV tokens -> excluded entirely
    test_docs = _docs(spark, [(50, "aa zz qq", "xx"),
                              (51, "zz qq rr", "xx")])
    preds = NB.nb_predict(NB.tokenize(test_docs.select("doc_id", "text")),
                          loglik, prior, "lang")
    got = {r.doc_id: r.pred for r in preds.collect()}
    assert got == {50: "xx"}


def test_tie_breaks_by_label_ascending(spark):
    # symmetric classes -> identical scores for a symmetric doc;
    # the argmax must pick the lexicographically smaller label
    train = [(1, "aa aa aa aa aa", "xx"), (2, "bb bb bb bb bb", "yy")]
    train_docs = _docs(spark, train)
    tok = NB.tokenize(train_docs.select("lang", "text"))
    loglik, prior = NB.nb_fit(tok, train_docs.select("lang"), "lang",
                              min_count=5)
    test_docs = _docs(spark, [(9, "aa bb", "xx")])
    preds = NB.nb_predict(NB.tokenize(test_docs.select("doc_id", "text")),
                          loglik, prior, "lang")
    rows = preds.collect()
    assert len(rows) == 1 and rows[0].pred == "xx"


def test_tokenize_drops_empty_and_lowercases(spark):
    df = spark.createDataFrame([(1, "Aa  BB cc ")],
                               "doc_id bigint, text string")
    toks = [r.token for r in NB.tokenize(df).collect()]
    assert sorted(toks) == ["aa", "bb", "cc"]
