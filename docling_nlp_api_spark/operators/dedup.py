"""Deduplication plane — exact, MinHash+LSH, SimHash, n-gram Jaccard —
first-class training-pipeline ops (driver brief).

Portability design: every hash is md5-hex based (identical in Spark and
DuckDB) so each operator has an exact SQL oracle; `hash()` builtins are
engine-specific and never used. Near-duplicates are *planted*
deterministically (a truncated copy of every 10th doc) so the operators
demonstrably find pairs on the synthetic corpus.

Scale notes: MinHash/LSH is the linear-cost path at 10^12 docs — signatures
are a narrow projection, the band-bucket groupBy shuffles only
(band, bucket, doc_id) tuples, and candidate verification joins stay within
buckets. The O(n^2) jaccard is only ever run on LSH candidates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spec import TOKEN_RE

N_MINHASH = 6          # minhash functions
BANDS = 3              # 3 bands x 2 rows
PLANT_EVERY = 10       # every 10th doc gets a planted near-dup
PLANT_TRUNC = 25       # near-dup = text minus last 25 chars

# Universal-hash minhash family: ONE md5 per shingle (its first 32 bits
# become h), then mh_i = min((A_i*h + B_i) mod P) — 6 integer perms per
# shingle instead of 6 md5 passes (~5x cheaper; md5 dominates otherwise).
# A_i < 2^31 and h < 2^32 keep A*h + B < 2^63 (no int64 overflow in
# either engine). All constants pinned for DuckDB parity.
MH_P = 4294967311          # prime > 2^32
MH_A = [1099087573, 2034678437, 1831565813, 419668217, 1973272007, 754974721]
MH_B = [217645177, 1343714161, 987654323, 152916539, 1846272233, 569952919]


def with_planted_dups(docs: DataFrame) -> DataFrame:
    """Append deterministic near-duplicates: doc_id+1000000, text truncated."""
    dups = (
        docs.filter(F.col("doc_id") % PLANT_EVERY == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr(f"substr(text, 1, length(text) - {PLANT_TRUNC})").alias("text"),
        )
    )
    return docs.select("doc_id", "text").unionByName(dups)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup via content-hash groupBy; representative = min doc_id.
    At scale this is one shuffle on a well-distributed hash key."""
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("representative"))
        .filter(F.col("n_docs") > 1)
    )


def with_shingles(docs: DataFrame) -> DataFrame:
    """3-word shingles over X3 tokens (docs with <3 tokens get none).

    Two-phase projection: the regex tokenizer is materialized as its own
    column FIRST, then the shingle transform indexes that column. Folding
    the tokenizer into the transform lambda re-evaluates the regex on the
    whole text per element access (higher-order functions are interpreted,
    no common-subexpression elimination) — ~3 full tokenizations per
    shingle, catastrophic at 100 TB."""
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0).alias("toks"),
    )
    return toks.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(toks) >= 3 THEN "
            "array_distinct(transform(sequence(0, size(toks) - 3), "
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) "
            "ELSE array() END"
        ).alias("sh"),
    )


def minhash_signatures(docs: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """MinHash: base hash h = first 32 bits of md5(shingle), then
    mh_i = min over shingles of (A_i*h + B_i) mod P (universal family).

    Flat formulation: posexplode the tokens ONCE (a generator argument is
    evaluated once per row — array-lambda formulations let CollapseProject
    inline the tokenizer into every element access, re-running the regex
    per shingle), build each 3-shingle with lead() over (doc_id, pos), and
    md5 the flat shingle column inside whole-stage codegen. min() over the
    shingle MULTISET equals min() over the distinct set, so skipping
    array_distinct changes nothing. The window and the final groupBy hash
    the same key; the aggregation is partial (one row per doc per task
    reaches the shuffle). Measured 10.4s -> ~1s at sf0.1."""
    from pyspark.sql import Window

    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)
    flat = docs.select("doc_id", F.posexplode(toks).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    # shingle and its validity flag computed in the SAME projection: a
    # window expression placed after the filter would see the filtered
    # row set and mis-build the last shingles of every doc
    w2, w3 = F.lead("w", 1).over(win), F.lead("w", 2).over(win)
    flat = (
        flat.select("doc_id", F.concat_ws(" ", "w", w2, w3).alias("sh"), w3.alias("w3"))
        .filter(F.col("w3").isNotNull())
        .select("doc_id", "sh")
    )
    h = F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long")
    flat = flat.select("doc_id", h.alias("h"))
    aggs = [
        F.min((F.lit(MH_A[i]) * F.col("h") + F.lit(MH_B[i])) % F.lit(MH_P)).alias(f"mh{i}")
        for i in range(k)
    ]
    return flat.groupBy("doc_id").agg(*aggs)


def minhash_from_shingles(shing: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """Array-native: one md5 per shingle materialized as an int column
    (hs), then k cheap integer-permutation minima over the same array.
    Measured faster than the explode->groupBy shape at sf0.1 (12.7s vs
    19s): staying array-native avoids materializing one row per shingle
    and the per-row hash-agg bookkeeping; no shuffle at all."""
    base = shing.filter(F.size("sh") > 0).select(
        "doc_id",
        F.transform(
            F.col("sh"),
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
        ).alias("hs"),
    )

    def perm(a: int, b: int):
        # factory closure: the transform lambda must take exactly ONE
        # parameter (a second one would receive the array index)
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MH_P)

    cols = [
        F.array_min(F.transform(F.col("hs"), perm(MH_A[i], MH_B[i]))).alias(f"mh{i}")
        for i in range(k)
    ]
    return base.select("doc_id", *cols)


def band_bucket(b: int):
    """LSH bucket id for band b: md5 over the band's two signature values
    (rendered as decimal strings, ':'-separated — identical in DuckDB)."""
    return F.md5(F.concat_ws(":", F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}")))


def lsh_buckets(docs: DataFrame) -> DataFrame:
    """LSH banding: 3 bands of 2 rows; bucket sizes > 1 are candidates.

    Single pass: bands explode from one signature row (a 3-way union of
    selects over the same subtree would re-run the tokenize+minhash scan
    once per band)."""
    sig = minhash_signatures(docs)
    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_bucket(b).alias("bucket"))
            for b in range(BANDS)
        ]
    )
    allb = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"), "doc_id"
    )
    return (
        allb.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"), F.max("doc_id").alias("max_doc"))
        .filter(F.col("n_docs") > 1)
    )


def candidate_pairs_jaccard(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """n-gram Jaccard verification of LSH candidates: pairs sharing any
    band bucket, exact jaccard over distinct 3-shingles."""
    shing = with_shingles(docs)
    sig = minhash_signatures(docs)
    band0 = sig.select("doc_id", band_bucket(0).alias("bucket"))
    a = band0.alias("a")
    b = band0.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = shing.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = shing.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash over X3 tokens: bit j of md5's first 16 bits, majority vote
    weighted by token frequency. Returns the packed signature."""
    toks = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)).alias("w")
    )
    h = F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    aggs = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)).alias(f"b{j}")
        for j in range(bits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*aggs)
    packed = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return per_doc.select("doc_id", packed.alias("simhash"))


def embedding_near_dup(spark: SparkSession, sf_dir: str, threshold: float = 0.40) -> DataFrame:
    """Embedding-cosine near-dup: pairs above threshold. Buckets by label
    (coarse cluster) first so the pairwise join never goes all-vs-all.

    Vectors are L2-normalized ONCE per side behind the label repartition
    (the join's own shuffle), so each pair costs a single array aggregate
    instead of dot + two per-pair norm recomputations (interpreted HOFs:
    3x fewer element ops, measured 6.7s -> ~2s at sf0.1)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nrm = "sqrt(aggregate(e, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v))"
    base = (
        emb.select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
        )
        .withColumn("nrm", F.expr(nrm))
        .repartition("label")  # barrier: materialize e/nrm before the lambda below
        .select("vec_id", "label", F.expr("transform(e, x -> x / nrm)").alias("en"))
    )
    a = base.select(F.col("vec_id").alias("id_a"), F.col("en").alias("ea"), "label")
    b = base.select(F.col("vec_id").alias("id_b"), F.col("en").alias("eb"), "label")
    pairs = a.join(b, "label").filter(F.col("id_a") < F.col("id_b"))
    cos = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        pairs.select("id_a", "id_b", F.round(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
