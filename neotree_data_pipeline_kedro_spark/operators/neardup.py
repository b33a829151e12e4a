"""Deduplication for LLM training data: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup (BASELINE.json north-star
extension; first-class alongside SURVEY §2).

Everything is built from built-in expressions (xxhash64, array lambdas,
groupBy) — no Python in the hot path, no driver-side state. Scale notes per
operator; the common shape is: per-doc signature (narrow map-side work) →
shuffle ONLY on small keys (band hashes / buckets) → verify candidate pairs.
At 100 TB the candidate-pair step is the cost center, which is why every
near-dup variant blocks (LSH bands / hamming bands / length buckets) before
any pairwise comparison — never an unblocked self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text

_MERSENNE = (1 << 61) - 1


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles over normalized text (distinct)."""
    toks = F.split(normalize_text(col), " ")
    k = F.size(toks) - (n - 1)
    return F.array_distinct(
        F.when(
            k <= 0,
            F.array(F.concat_ws(" ", toks)),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


def exact_dedupe(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: md5-of-normalized-text groups, keep lowest id.

    hash-groupBy: one shuffle on a 128-bit key; at scale prefer this over
    groupBy(full text) — the shuffle carries 32 bytes, not documents.
    """
    h = F.md5(normalize_text(F.col(text_col)))
    w = Window.partitionBy("__h").orderBy(F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def minhash_signature(col: Column, num_hashes: int = 64, n: int = 3) -> Column:
    """MinHash signature: k independent hash functions
    h_i(shingle) = xxhash64(i, xxhash64(shingle)), min-folded per i.

    Deterministic (no RNG), reproducible across runs/executors. Built as ONE
    ``aggregate`` traversal of the shingle array updating a k-wide running-min
    accumulator — the shingle pipeline (tokenize → slice → concat → hash) is
    evaluated exactly once per row, not once per permutation, and no
    materialization barrier is needed to stop Catalyst from inlining it k
    times.
    """
    base = F.transform(shingles(col, n), lambda s: F.xxhash64(s))
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        base,
        F.array_repeat(F.lit(9223372036854775807).cast("bigint"), num_hashes),
        lambda acc, x: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(i, x)),
            lambda m, h: F.least(m, h),
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH: shingle → minhash →
    split signature into ``bands`` bands → hash each band → docs sharing a
    band hash become candidates.

    Shuffles only (band_id, band_hash, id) — signature bytes, not text.
    Returns distinct (id_a, id_b) with id_a < id_b; verify with
    ``ngram_jaccard_on_pairs`` (LSH gives no false-negative guarantees
    beyond the band/row S-curve; verification is the contract).
    """
    rows = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, shingle_n)
    # bands unrolled in Python, not a transform() lambda: __sig is then
    # referenced `bands` times, so CollapseProject keeps the signature as a
    # separate projection instead of inlining (and re-evaluating) the whole
    # minhash aggregate inside the per-band loop. xxhash64 hashes the band's
    # sub-array directly — no string serialization.
    banded = df.select(F.col(id_col).alias("id"), sig.alias("__sig")).select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("__sig", b * rows + 1, rows)).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_on_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard."""
    sh = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    )
    return (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    length_bucket: int = 32,
    block_col: str | None = None,
) -> DataFrame:
    """Blocked exact n-gram Jaccard similarity join.

    Blocking: ``block_col`` if given (a source/cluster/partition key);
    otherwise token-length buckets (a doc pair with Jaccard ≥ t cannot
    differ in shingle count by more than (1-t)/t, so adjacent buckets
    suffice). O(pairs-within-block), never O(n²) corpus-wide.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        *([F.col(block_col).alias("bucket")] if block_col else []),
        shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("nsh", F.size("sh"))
    if block_col:
        blocked = sh
    else:
        blocked = sh.withColumn(
            "bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.col("nsh") / length_bucket),
                        F.floor(F.col("nsh") * F.lit(threshold) / length_bucket),
                    )
                )
            ),
        )
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .distinct()
    )


def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash over word tokens: per-bit ±1 votes from xxhash64(token),
    packed into a signed 64-bit integer. Pure array-lambda fold — JVM-side.

    Bit positions are Python ints (shiftright requires literal shift
    amounts), so the per-token vote vector is an unrolled 64-wide array
    expression.
    """
    toks = F.split(normalize_text(col), " ")
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                    for i in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    packed = F.lit(0).cast("bigint")
    for i in range(bits):
        v = F.element_at(votes, i + 1)
        # two's-complement top bit carries -2^(bits-1)
        weight = -(1 << (bits - 1)) if i == bits - 1 else (1 << i)
        packed = packed + F.when(v > 0, F.lit(weight).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return packed


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates by the band trick: split the 64-bit hash
    into ``bands`` segments — any pair within hamming distance < bands
    shares at least one exact segment. Join per segment, verify with
    ``bit_count(xor) <= max_hamming``.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    sh = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh"))
    seg = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("seg"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("s"),
    ).select("id", "sh", F.col("s.band").alias("band"), F.col("s.seg").alias("seg"))
    a = seg.alias("a")
    b = seg.alias("b")
    return (
        a.join(b, ["band", "seg"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns via sequential
    fold (zip_with product + aggregate sum) — deterministic summation order,
    stable across engines for oracle comparison."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def quantize_vec(col: Column, scale: int = 1_000_000) -> Column:
    """Quantize array<float> to array<bigint> (round half away from zero).

    Integer dot products / norms are then EXACT and order-independent —
    bit-identical across Spark, DuckDB, or any engine — while differing from
    float cosine by < 1e-5. Used by the oracle-checked similarity queries;
    `cosine` stays the raw float path."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * scale, 0).cast("bigint")
    )


def quantized_cosine(a: Column, b: Column, scale: int = 1_000_000) -> Column:
    """Cosine over quantized vectors: exact integer dot/norms, then one
    deterministic double division — cross-engine reproducible."""
    qa, qb = quantize_vec(a, scale), quantize_vec(b, scale)
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )
    na = F.aggregate(
        F.transform(qa, lambda x: x * x), F.lit(0).cast("bigint"), lambda s, x: s + x
    )
    nb = F.aggregate(
        F.transform(qb, lambda x: x * x), F.lit(0).cast("bigint"), lambda s, x: s + x
    )
    return dot.cast("double") / (
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )


def prep_vectors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    scale: int | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-side projection for pairwise cosine work: ``(id, *keep, __v,
    __n)`` where ``__v`` is the (optionally quantized) vector and ``__n``
    its squared norm.

    Hoisting this BELOW any pairwise join means each vector is cast/quantized
    and normed once per row, not once per candidate pair — at 100 TB the
    pair side dominates by orders of magnitude. ``scale`` set → integer
    quantization (cross-engine-exact, see ``quantize_vec``); None → double.
    """
    if scale:
        v = quantize_vec(F.col(vec_col), scale)
        zero = F.lit(0).cast("bigint")
    else:
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        zero = F.lit(0.0)
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep],
        v.alias("__v"),
        F.aggregate(
            F.transform(v, lambda x: x * x), zero, lambda s, x: s + x
        ).alias("__n"),
    )


def pair_cosine(
    va: Column, na: Column, vb: Column, nb: Column, integer: bool = True
) -> Column:
    """Cosine from prepped sides: only the dot product is per-pair work.
    ``integer`` must match the ``scale`` choice made in ``prep_vectors``
    (quantized bigint vectors vs double vectors)."""
    zero = F.lit(0).cast("bigint") if integer else F.lit(0.0)
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), zero, lambda s, x: s + x)
    return dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
    scale: int | None = 1_000_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs above ``threshold``.

    ``block_col`` provides the blocking key (a cluster id, label, LSH sign
    bucket …). Without one, falls back to a random-hyperplane sign bucket
    (8 deterministic planes) so the self-join never runs unblocked — at the
    cost of missing cross-bucket pairs near the planes (standard LSH
    recall trade; raise planes/threshold accordingly).
    """
    v = prep_vectors(df, id_col, vec_col, scale, keep=(block_col,) if block_col else ())
    if block_col is not None:
        v = v.withColumnRenamed(block_col, "block")
    else:
        v = v.withColumn("block", _hyperplane_bucket(F.col("__v"), planes=8))
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, "block")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            pair_cosine(
                F.col("a.__v"),
                F.col("a.__n"),
                F.col("b.__v"),
                F.col("b.__n"),
                integer=scale is not None,
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _hyperplane_bucket(vec: Column, planes: int = 8, seed: int = 0) -> Column:
    """Deterministic random-hyperplane LSH bucket: plane p's j-th coefficient
    is a fixed pseudo-random ±1 from xxhash64(seed+p, j). Plane indices are
    Python ints; only the dimension index is a lambda column. ``seed``
    derives independent plane sets for multi-table LSH."""
    dim = F.size(vec)
    bucket = F.lit(0).cast("bigint")

    def _signed_term(plane: int):
        # closure factory: PySpark derives lambda arity from the signature,
        # so the plane index must be captured, not a default argument
        return lambda x, j: x.cast("double") * F.when(
            F.xxhash64(F.lit(seed + plane), j) % 2 == 0, 1.0
        ).otherwise(-1.0)

    for p in range(planes):
        dotp = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), dim - 1), _signed_term(p)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(dotp > 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket
