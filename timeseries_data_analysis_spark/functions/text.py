"""Text-analysis functions for corpus pipelines (training-data ops).

Language-ID (stopword n-gram heuristic), quality scoring, token counting,
and document fingerprinting — each a pure Column expression (JVM regex +
arithmetic, no UDF) so a 100 TB documents table processes inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .math_fns import _c, ColumnOrName, safe_div

# Tiny per-language stopword marker sets — a deterministic public-knowledge
# heuristic (same idea as fastText's char-ngram prior, radically simplified
# so the oracle can replicate it in SQL).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def token_count(col: ColumnOrName) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(_c(col))
    return F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))


def word_tokens(col: ColumnOrName) -> Column:
    """BPE-ish subword-friendly tokenization: alnum runs OR single symbols.

    ``regexp_extract_all`` with ``[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]`` — the
    classic pre-tokenizer split (letters/digits runs, punctuation as its
    own token).
    """
    return F.regexp_extract_all(_c(col), F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), 0)


def subword_token_count(col: ColumnOrName) -> Column:
    return F.size(word_tokens(col))


def punct_ratio(col: ColumnOrName) -> Column:
    """Fraction of non-space characters that are punctuation/symbols."""
    t = _c(col)
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    punct = F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", ""))
    return safe_div(punct.cast("double"), nonspace.cast("double"))


def stopword_ratio(col: ColumnOrName, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are in the language's marker set."""
    toks = F.split(F.trim(F.lower(_c(col))), r"\s+")
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return safe_div(hits.cast("double"), F.size(toks).cast("double"))


def quality_score(col: ColumnOrName) -> Column:
    """Composite [0,1] quality score: length band + low punct + stopword presence.

    Deterministic linear blend (weights public-heuristic, documented):
      0.4·len_ok (20..2000 words) + 0.3·(1−punct_ratio) + 0.3·min(1, 5·stopword_ratio)
    """
    n = token_count(col).cast("double")
    len_ok = F.when((n >= 20) & (n <= 2000), 1.0).otherwise(0.0)
    return (0.4 * len_ok
            + 0.3 * (1.0 - punct_ratio(col))
            + 0.3 * F.least(F.lit(1.0), stopword_ratio(col) * 5.0))


def lang_id(col: ColumnOrName) -> Column:
    """Predicted language = argmax of marker-set hit counts; 'und' if no hits.

    Ties break by language code order (deterministic; same rule in the
    SQL oracle).
    """
    toks = F.split(F.trim(F.lower(_c(col))), r"\s+")
    scores = []
    for code, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append((code, F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))))
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for code, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), code).otherwise(expr)
    return expr


def fingerprint(col: ColumnOrName) -> Column:
    """Canonical document fingerprint: md5 of sorted distinct normalized tokens.

    The classic "fingerprint clustering" key (OpenRefine-style): case/
    punctuation/word-order insensitive. Portable to any SQL oracle.
    """
    toks = F.split(F.trim(F.regexp_replace(F.lower(_c(col)), r"[^a-z0-9 ]", " ")), r"\s+")
    canon = F.array_join(F.array_sort(F.array_distinct(F.filter(
        toks, lambda t: F.length(t) > 0))), " ")
    return F.md5(canon)


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(col: ColumnOrName) -> Column:
    """The Gopher document-quality heuristics (Rae et al. 2021, §A1.1 —
    public filtering rules used by most LLM corpus pipelines), as ONE
    struct of per-rule pass flags plus the measured statistics:

    - ``n_words`` in [50, 100000]
    - mean word length in [3, 10]
    - symbol-to-word ratio ≤ 0.1 (``#``/``…`` in the paper; any
      non-alphanumeric non-space char here)
    - ≥ 80% of words contain at least one alphabetic character
    - ≥ 2 of the paper's 8 common-English stopwords present

    Every term is JVM regex + integer arithmetic inside codegen (no
    UDF) and replays exactly in an external SQL engine. Flags are int
    0/1 (not boolean) so the cross-engine value hash is dtype-stable.
    """
    t = F.trim(_c(col))
    toks = F.split(F.lower(t), r"\s+")
    n_words = F.when(F.length(t) == 0, 0).otherwise(F.size(toks))
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x))
    mean_len = safe_div(total_len.cast("double"), n_words.cast("double"))
    n_sym = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    sym_ratio = safe_div(n_sym.cast("double"), n_words.cast("double"))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    alpha_frac = safe_div(n_alpha.cast("double"), n_words.cast("double"))
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stops))
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    ok_words = flag((n_words >= 50) & (n_words <= 100_000))
    ok_mean = flag((mean_len >= 3.0) & (mean_len <= 10.0))
    ok_sym = flag(sym_ratio <= 0.1)
    ok_alpha = flag(alpha_frac >= 0.8)
    ok_stop = flag(n_stop >= 2)
    return F.struct(
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_words * ok_mean * ok_sym * ok_alpha * ok_stop).alias("passes"),
    )


# PII patterns shared by the engine and the SQL oracle. Deliberately
# restricted to syntax with IDENTICAL semantics in Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b, ASCII \d — no
# lookaround, no backrefs. Scrub order is fixed (email → ipv4 → phone) so
# the rewritten text is deterministic; counts are measured on the ORIGINAL
# text per pattern, so overlapping matches count under every pattern they
# hit (mirrored exactly in the oracle).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_count(col: ColumnOrName, pattern: str) -> Column:
    """Match count of one PII pattern — ``size(regexp_extract_all(...))``,
    pure JVM regex inside codegen (no UDF)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(pattern), 0))


def pii_scrub(col: ColumnOrName) -> Column:
    """Text with every PII match replaced by its typed placeholder, applied
    in the fixed PII_PATTERNS order."""
    out = _c(col)
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


# Rabin-Karp style polynomial rolling hash, computed over per-token base
# hashes. B/P chosen so every intermediate stays inside int64:
# acc < P ≈ 2^31 and tok_hash < 2^32, so acc·B + tok < 2^31·2^5 + 2^32 ≪ 2^63.
ROLLING_BASE = 31
ROLLING_PRIME = 2_147_483_647  # 2^31 − 1 (Mersenne)


def token_base_hashes(col: ColumnOrName) -> Column:
    """array<bigint> of portable per-token hashes (md5 8-hex prefix).

    Materialize this in its own select before feeding HOF lambdas —
    Catalyst does not CSE expressions into lambda bodies.
    """
    toks = F.split(F.trim(F.regexp_replace(F.lower(_c(col)), r"[^a-z0-9 ]", " ")), r"\s+")
    toks = F.filter(toks, lambda t: F.length(t) > 0)
    return F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"))


def rolling_hash(hashed: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash folded
    over the token-hash sequence, ``h = Σ tᵢ·Bⁿ⁻ⁱ mod P``.

    Complements :func:`fingerprint` (order-insensitive): two documents with
    the same words in different order share a fingerprint but not a rolling
    hash. One ``aggregate`` pass per doc, pure JVM arithmetic; the same
    fold is expressible in any SQL engine with a list-reduce.
    """
    return F.aggregate(
        hashed, F.lit(0).cast("bigint"),
        lambda acc, t: (acc * ROLLING_BASE + t) % ROLLING_PRIME)


def kgram_hashes(hashed: Column, k: int = 4) -> Column:
    """Rolling hashes of every k-token gram from a MATERIALIZED token-hash
    array (each gram re-folds k terms — k is a small constant).

    Stage 1 of MOSS-style winnowing; materialize the result in its own
    select before :func:`winnow_minima` (lambdas defeat CSE — an inlined
    argument is re-evaluated per window).
    """
    def gram_hash(i: Column) -> Column:
        acc = F.element_at(hashed, (i + 1).cast("int"))
        for j in range(1, k):
            acc = (acc * ROLLING_BASE
                   + F.element_at(hashed, (i + j + 1).cast("int"))) % ROLLING_PRIME
        return acc

    # sequence(0, n-1) is DESCENDING for n <= 0, so the index range is
    # guarded by the size predicate that makes it non-empty
    return F.when(
        F.size(hashed) >= k,
        F.transform(F.sequence(F.lit(0), F.size(hashed) - k), gram_hash),
    ).otherwise(F.array().cast("array<bigint>"))


def winnow_minima(grams: Column, w: int = 5) -> Column:
    """MOSS winnowing stage 2: distinct sorted minima of each sliding
    window of ``w`` consecutive k-gram hashes (Schleimer et al. 2003,
    public algorithm). Any shared run of ≥ w + k − 1 tokens between two
    documents yields at least one shared fingerprint.

    ``grams`` must be a materialized column (see :func:`kgram_hashes`).
    """
    mins = F.when(
        F.size(grams) >= w,
        F.transform(F.sequence(F.lit(0), F.size(grams) - w),
                    lambda i: F.array_min(F.slice(grams, i + 1, w))),
    ).otherwise(grams)
    return F.array_sort(F.array_distinct(mins))
