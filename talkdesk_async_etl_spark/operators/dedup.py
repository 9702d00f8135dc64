"""Deduplication operators (SURVEY.md §2.10 D1/D2 + scale variants).

Five dedup families over the ``documents`` table, ordered by cost:

1. ``dedup_exact``       — hash-groupBy on the full text (one shuffle).
2. ``text_fingerprint``  — normalized-text fingerprint (in text.py).
3. ``dedup_near_jaccard``— exact n-gram Jaccard pairs (oracle-checked).
4. ``dedup_minhash_lsh`` — MinHash + banded LSH candidates, exact
                           verification (the 100 TB path; rows-only).
5. ``dedup_simhash``     — SimHash signatures + pigeonhole banding for
                           hamming ≤ 3 (rows-only).
6. ``dedup_embedding_cosine`` — embedding near-dup pairs (oracle-checked).

Scale analysis: the exact-Jaccard self-join on shingles is quadratic in
docs-per-shingle — correct at test scale and used as the oracle, but
the production path is MinHash-LSH: signature cost is linear in tokens,
banding bounds the join to same-bucket candidates, and verification is
linear in candidates. SimHash is the cheapest near-dup signal (single
64-bit signature; hamming via ``bit_count(xor)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t

# Fixed MinHash permutation parameters (seed pinned — LSH must be
# deterministic run-to-run for resumable 100 TB jobs).
_MINHASH_PERMS = 64
_LSH_BAND_ROWS = 2  # 32 bands × 2 rows → catches Jaccard ≥ ~0.3 candidates
# 2^31-1: params and base hashes stay below 31 bits so (a·h+b) never
# overflows a 64-bit long (universal hashing needs exact arithmetic).
_MERSENNE31 = (1 << 31) - 1


def _perm_params(n: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(42)
    return [(rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31)) for _ in range(n)]


def _shingles(text_col, k: int = 3):
    """Distinct k-word shingles as an array column (JVM higher-order
    functions — no Python per row)."""
    toks = F.split(text_col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )


@query(
    "dedup_exact",
    oracle="""
        SELECT text, CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY text
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/T5: exact dedup — keep the lowest doc_id per identical text.
    One hash-shuffle on the text; at 100 TB, group on a 128-bit digest
    of the text instead of shipping full documents through the shuffle
    (see text_fingerprint)."""
    return (
        t(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_copies"))
    )


_JACCARD_ORACLE = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS sh
        FROM toks, range(1, 2000) r(i) WHERE i + 2 <= len(tk)
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b USING (sh)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(c * 1.0 / (ca.n + cb.n - c), 6) AS jaccard
    FROM common
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.6
"""


@query("dedup_near_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (exact formulation): document pairs with 3-shingle Jaccard
    ≥ 0.6. Shingle → explode → self-join on shingle → per-pair common
    count → Jaccard. The Jaccard value is a ratio of exact integers, so
    it is bit-identical across engines.

    This exact self-join is the oracle-checkable semantics; its cost is
    Σ_shingle (docs_with_shingle)² — fine here, quadratic on hot
    shingles at 100 TB, where dedup_minhash_lsh replaces it."""
    docs = t(spark, sf_dir, "documents").select("doc_id", _shingles(F.col("text")).alias("shs"))
    sh = docs.select("doc_id", F.explode("shs").alias("sh"))
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= 0.6)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query("dedup_minhash_lsh", oracle=None, tags=("dedup", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (scale formulation): MinHash signatures + banded LSH.

    Pipeline: shingle → one 64-bit base hash per shingle (xxhash64,
    JVM) → 64 universal-hash permutations ((a·h+b) mod 2^61−1) → min
    per (doc, perm) → 32 bands of 2 rows → docs agreeing on any band
    become candidates → candidates verified with EXACT Jaccard on their
    shingle sets → pairs ≥ 0.6.

    Cost at scale: signatures are linear in total tokens; the only join
    is bucket-local (band_key equality); verification touches candidate
    pairs only. Output ⊆ dedup_near_jaccard's (banding can miss pairs —
    P(miss) ≈ (1−j²)³² ≈ 10⁻⁷ at j = 0.6), hence rows-only check +
    equality unit test vs the exact operator at test scale."""
    docs = t(spark, sf_dir, "documents").select("doc_id", _shingles(F.col("text")).alias("shs"))
    sh = docs.select("doc_id", F.explode("shs").alias("sh")).withColumn(
        "h", F.pmod(F.xxhash64("sh"), F.lit(_MERSENNE31))
    )
    params = _perm_params(_MINHASH_PERMS)
    perms = F.array(
        *[F.struct(F.lit(i).alias("p"), F.lit(a).alias("a"), F.lit(b).alias("b")) for i, (a, b) in enumerate(params)]
    )
    # (doc, shingle) × perms → (doc, perm, permuted hash); min per (doc, perm).
    sig = (
        sh.select("doc_id", "h", F.explode(perms).alias("pp"))
        .select(
            "doc_id",
            F.col("pp.p").alias("p"),
            ((F.col("pp.a") * F.col("h") + F.col("pp.b")) % _MERSENNE31).alias("ph"),
        )
        .groupBy("doc_id", "p")
        .agg(F.min("ph").alias("minh"))
    )
    bands = (
        sig.withColumn("band", (F.col("p") / _LSH_BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("p", "minh"))).alias("rows"))
        .withColumn("band_key", F.xxhash64(F.to_json(F.struct("band", "rows"))))
        .select("doc_id", "band_key")
    )
    x, y = bands.alias("x"), bands.alias("y")
    candidates = (
        x.join(y, (F.col("x.band_key") == F.col("y.band_key")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # Exact verification on candidates only.
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    union = F.size(F.array_union("shs_a", "shs_b"))
    jac = inter / union
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.6)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query("dedup_simhash", oracle=None, tags=("dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (cheapest signal): 64-bit SimHash near-dup pairs at hamming
    ≤ 3. Per-token xxhash64 → per-bit ±1 votes → sign → packed 64-bit
    signature; candidate pairs via pigeonhole banding (4 × 16-bit
    chunks — hamming ≤ 3 ⟹ at least one chunk identical) → verified
    with ``bit_count(xor) ≤ 3``. Entirely JVM-side; the join is
    chunk-equality only. Hash-seeded → rows-only check (unit-tested
    against a pure-Python model)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("toks"))
    votes = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
        .select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"))
        # F.shiftrightunsigned only takes a literal shift amount; the
        # SQL form accepts a column.
        .withColumn(
            "vote",
            F.when(F.expr("shiftrightunsigned(h, bit) & 1") == 1, 1).otherwise(-1),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    sig = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, cast(bit as int))")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("chunk"),
    ).withColumn(
        "chunk_val",
        F.expr("shiftrightunsigned(simhash, chunk * 16) & 65535"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


_COSINE_ORACLE = """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.5
"""


@query("dedup_embedding_cosine", oracle=_COSINE_ORACLE, tags=("dedup", "similarity"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D3 bridge: embedding near-dup pairs with cosine ≥ 0.5
    (testdata's max pairwise cosine is ~0.55 — 0.5 yields a small
    nonempty answer). Brute-force O(n²) pair scan with JVM
    higher-order-function dot products — the oracle-checkable
    semantics; the LSH-bucketed scale path is sim_topk_ivf
    (similarity.py). All math in float64."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    with_norm = emb.withColumn(
        "norm", F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    )
    a = with_norm.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = with_norm.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    sim = dot / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim_raw", sim)
        .filter(F.col("cos_sim_raw") >= 0.5)
        .select("vec_a", "vec_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )
