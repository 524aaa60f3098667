"""Document deduplication for large-scale training-data pipelines.

Not in the reference (its data is sensor telemetry); these are the
first-class corpus operators a 100 TB text pipeline needs: exact dedup,
MinHash+LSH near-dedup, SimHash, and n-gram Jaccard.

All hashing is **engine-portable**: base token/shingle hashes derive from
``md5`` (identical in Spark and DuckDB/any oracle) and the MinHash family
is the classic affine family h_i(x) = (a_i·x + b_i) mod p over that base
hash — so correctness oracles can replay the exact pipeline in SQL.

Scale design:
- Exact dedup: hash-groupBy on a digest of the normalized text — the
  shuffle moves 16-byte digests + ids, never the documents.
- MinHash: signatures are computed per-document with higher-order array
  functions (transform/aggregate — JVM, no UDF). LSH banding turns
  all-pairs O(n²) into a groupBy on (band, band-hash) buckets followed by
  within-bucket pair generation; candidate pairs then verify with exact
  Jaccard. Skewed buckets (boilerplate docs) are capped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Affine minhash family h_i(x) = (a_i·x + b_i) mod p. Everything is sized
# so the arithmetic NEVER overflows a signed 64-bit integer in ANY engine
# (base hash < 2^32, a_i < 2^30 → product < 2^62): overflow wrap-around is
# engine-specific and would silently break oracle portability.
MINHASH_PRIME = (1 << 61) - 1
# Deterministic coefficients: odd primes < 2^30 (public-constant choice).
_A = [1073741789, 536870909, 268435399, 134217689,
      67108859, 33554393, 16777213, 805306457,
      402653171, 201326611, 100663291, 50331653,
      25165843, 12582917, 6291469, 3145739]
_B = [981783497, 545602969, 101842887, 718281829,
      141592653, 618033988, 414213562, 732050807,
      236067977, 449489742, 645751311, 828427124,
      162277660, 316624790, 464101615, 605551275]


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization: lowercase, strip non-alphanumerics,
    collapse whitespace runs, trim — so 'Hello,  World!' ≡ 'hello world'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", " "), r" +", " "))


def text_digest(col: Column | str) -> Column:
    """Portable 60-bit digest of normalized text (md5-hex prefix → bigint)."""
    return F.conv(F.substring(F.md5(normalize_text(col)), 1, 15), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: keep min-id representative + duplicate count.

    groupBy on the digest: map-side combine shrinks the shuffle to one row
    per distinct digest per partition. At 100 TB the 60-bit digest
    collides ~never within a dedup batch (birthday bound ≈ 10^9 docs →
    p<0.001); use the full md5 string if stronger guarantees are needed.
    """
    return (df.select(F.col(id_col), text_digest(text_col).alias("digest"))
            .groupBy("digest")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_dups")))


def tokens(col: Column | str) -> Column:
    """Normalized word tokens. MATERIALIZE this in its own select before
    shingling: every ``element_at`` inside a shingle lambda re-evaluates
    its argument expression, so an inlined normalize+split turns one regex
    pass into one per (shingle × n) — a >100× blowup on real text.
    """
    return F.split(F.trim(normalize_text(col)), r"\s+")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a materialized token-array column."""
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - 1)
    return F.when(F.size(toks) >= n,
                  F.transform(idx, lambda i: F.concat_ws(" ", *[
                      F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)
                  ]))
                  ).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of normalized text as array<string>.

    Convenience single-expression form — fine for one-off use on short
    text; pipelines must materialize ``tokens`` first (see that docstring).
    """
    return shingles_from_tokens(tokens(col), n)


def _shingle_hash(s: Column) -> Column:
    """Portable 32-bit base hash of one shingle (md5 8-hex prefix → bigint).

    32 bits keeps every downstream affine product inside int64; collision
    rate within one document's shingle set (~10³ shingles) is negligible.
    """
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def hash_shingles(sh: Column) -> Column:
    """array<string> shingles → array<bigint> portable base hashes."""
    return F.transform(sh, _shingle_hash)


def hashed_shingles(col: Column | str, n: int = 3) -> Column:
    """array<bigint> of portable base hashes of the text's shingles.

    Materialize this ONCE (its own select) before fanning out into the
    per-hash-function minhash/simhash expressions: each md5 is expensive
    and Catalyst will not common-subexpression-eliminate it out of
    higher-order-function lambdas, so inlining it ``num_hashes`` times
    multiplies the md5 work by ``num_hashes``.
    """
    return F.transform(shingles(col, n), _shingle_hash)


def minhash_from_hashes(hashed: Column, num_hashes: int = 8) -> Column:
    """MinHash signature array<bigint> from a pre-hashed shingle array.

    For each affine hash h_i, the signature element is
    ``min over shingles of (a_i·base + b_i) mod p`` — computed with
    ``transform`` + ``array_min`` entirely in the JVM, one cheap
    arithmetic pass per hash function over the already-hashed array.
    """
    def affine(a: int, b: int):
        # closure factory — PySpark counts lambda default-args as extra
        # lambda parameters, so the coefficients must be captured this way
        return lambda h: (h * a + b) % MINHASH_PRIME

    elems = []
    for i in range(num_hashes):
        a, b = _A[i % len(_A)], _B[i % len(_B)]
        elems.append(F.array_min(F.transform(hashed, affine(a, b))))
    return F.array(*elems)


def minhash_signature(col: Column | str, n: int = 3,
                      num_hashes: int = 8) -> Column:
    """MinHash signature array<bigint> of length ``num_hashes``.

    Convenience single-expression form; prefer materializing
    ``hashed_shingles`` first in pipelines (see ``minhash_lsh_candidates``).
    """
    return minhash_from_hashes(hashed_shingles(col, n), num_hashes)


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           num_hashes: int = 16, bands: int = 8,
                           max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any band hash land in one bucket; pairs are generated
    within buckets via a self-join on the bucket key with ``id_l < id_r``.
    ``max_bucket`` caps pathological buckets (boilerplate skew) — the cap
    is logged via the ``bucket_n`` column rather than silently dropped.

    Returns (id_l, id_r, band) candidate pairs (dedup by pair downstream).
    """
    rows_per_band = num_hashes // bands
    # compute-heavy per-row stage: fan out first — a corpus that arrives as
    # one small parquet file would otherwise hash every shingle in ONE task
    par = df.sparkSession.sparkContext.defaultParallelism
    # each select materializes one stage: tokens → shingles → hashes → sig,
    # so no expression is re-evaluated inside downstream lambdas
    sig = (df.select(F.col(id_col).alias("_id"), F.col(text_col))
           .repartition(par)
           .select("_id", tokens(text_col).alias("_toks"))
           .select("_id", shingles_from_tokens(F.col("_toks"), n).alias("_sh"))
           .select("_id", F.transform("_sh", _shingle_hash).alias("_hashed"))
           .select("_id",
                   minhash_from_hashes(F.col("_hashed"), num_hashes).alias("_sig")))
    band_rows = sig.select(
        "_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.md5(F.concat_ws(",", F.slice(
                    F.col("_sig"), b * rows_per_band + 1, rows_per_band
                ))).alias("bucket"))
        )).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    sized = band_rows.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bucket_n") <= max_bucket)
    a = sized.select(F.col("_id").alias("id_l"), "band", "bucket")
    b = sized.select(F.col("_id").alias("id_r"), "band", "bucket")
    return (a.join(b, on=["band", "bucket"])
            .filter(F.col("id_l") < F.col("id_r"))
            .select("id_l", "id_r", "band").distinct())


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Joins the (small) candidate pair list back to the docs and computes
    |A∩B|/|A∪B| with ``array_intersect``/``array_union`` — set semantics,
    JVM-side.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    d = (docs.select(F.col(id_col).alias("_jid"), F.col(text_col))
         .repartition(par)
         .select("_jid", tokens(text_col).alias("_toks"))
         .select("_jid", F.array_distinct(
             shingles_from_tokens(F.col("_toks"), n)).alias("_sh")))
    out = (df_pairs
           .join(d.select(F.col("_jid").alias("id_l"), F.col("_sh").alias("_sh_l")), "id_l")
           .join(d.select(F.col("_jid").alias("id_r"), F.col("_sh").alias("_sh_r")), "id_r"))
    inter = F.size(F.array_intersect("_sh_l", "_sh_r"))
    union = F.size(F.array_union("_sh_l", "_sh_r"))
    return out.select(
        "id_l", "id_r",
        F.when(union > 0, inter.cast("double") / union).otherwise(0.0).alias("jaccard"))


def ngram_jaccard_all_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n: int = 3,
                            threshold: float = 0.5) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs via an inverted-index join.

    Each document's DISTINCT shingle set is exploded into (shingle-hash,
    doc) postings; a self-equi-join on the 32-bit shingle hash generates
    exactly one match row per shared shingle, so ``count(*)`` per pair IS
    |A∩B| and Jaccard follows from |A∪B| = |A|+|B|−|A∩B|. Only pairs with
    at least one shared shingle ever materialize — the classic set-
    similarity join (cf. Vernica et al., SIGMOD'10).

    Scale: the join shuffles 8-byte hashes + ids, never text. Super-common
    shingles (boilerplate) skew the bucket sizes; at corpus scale run
    ``minhash_lsh_candidates`` first and verify with ``ngram_jaccard`` —
    this operator is the exact path for bounded inputs and the oracle
    anchor for the approximate ones.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (docs.select(F.col(id_col).alias("_id"), F.col(text_col))
          .repartition(par)
          .select("_id", tokens(text_col).alias("_toks"))
          .select("_id", F.array_distinct(
              shingles_from_tokens(F.col("_toks"), n)).alias("_sh")))
    post = sh.select("_id", F.size("_sh").alias("_n"),
                     F.explode(F.transform("_sh", _shingle_hash)).alias("_h"))
    a = post.select(F.col("_id").alias("id_l"), F.col("_n").alias("_n_l"), "_h")
    b = post.select(F.col("_id").alias("id_r"), F.col("_n").alias("_n_r"), "_h")
    inter = F.col("inter")
    union = F.col("_n_l") + F.col("_n_r") - inter
    return (a.join(b, "_h")
            .filter(F.col("id_l") < F.col("id_r"))
            .groupBy("id_l", "id_r")
            .agg(F.count(F.lit(1)).alias("inter"),
                 F.min("_n_l").alias("_n_l"), F.min("_n_r").alias("_n_r"))
            .filter(inter.cast("double") / union >= threshold)
            .select("id_l", "id_r", "inter",
                    union.cast("bigint").alias("union_sz"),
                    (inter.cast("double") / union).alias("jaccard")))


def simhash_from_hashes(hashed: Column, bits: int = 16) -> Column:
    """SimHash fingerprint from a pre-hashed shingle array.

    Per bit b: sum over shingles of ±1 depending on bit b of the shingle
    hash; fingerprint bit = 1 if the sum > 0. ONE ``aggregate`` pass with
    an array<bigint> accumulator of per-bit votes (elementwise ``zip_with``
    add), then a ``transform``+``aggregate`` to assemble the fingerprint —
    each shingle hash is consumed exactly once. ``bits`` ≤ 32 keeps the
    fingerprint inside a bigint portably.
    """
    # bit masks as a literal array — shiftleft/shiftright need Python-int
    # shift amounts, so bit extraction inside lambdas uses bitwiseAND masks
    masks = F.array(*[F.lit(1 << b).cast("bigint") for b in range(bits)])
    zero = F.array(*[F.lit(0).cast("bigint") for _ in range(bits)])

    votes = F.aggregate(
        hashed, zero,
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)))

    return F.aggregate(
        F.zip_with(votes, masks,
                   lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def simhash(col: Column | str, n: int = 2, bits: int = 16) -> Column:
    """SimHash fingerprint over word n-grams (portable arithmetic).

    Convenience form; in pipelines materialize ``hashed_shingles`` in its
    own select first so the md5 pass runs once (see module docstring).
    """
    return simhash_from_hashes(hashed_shingles(col, n), bits)
