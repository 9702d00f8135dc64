"""Deduplication operators (SURVEY.md §2.10 D1/D2 + scale variants).

Five dedup families over the ``documents`` table, ordered by cost:

1. ``dedup_exact``       — hash-groupBy on the full text (one shuffle).
2. ``text_fingerprint``  — normalized-text fingerprint (in text.py).
3. ``dedup_near_jaccard``— exact n-gram Jaccard pairs (oracle-checked).
4. ``dedup_minhash_lsh`` — MinHash + banded LSH candidates, exact
                           verification (the 100 TB path; rows-only).
5. ``dedup_simhash``     — SimHash signatures + pigeonhole banding for
                           hamming ≤ 3 (rows-only).
6. ``dedup_embedding_cosine`` — embedding near-dup pairs (oracle-checked),
   plus ``dedup_semantic_components`` clustering them.
7. ``dedup_incremental_jaccard`` — new-batch-vs-corpus pairs only (the
   daily-ingestion shape; probe side restricted to the new batch).

Scale analysis: the exact-Jaccard self-join on shingles is quadratic in
docs-per-shingle — correct at test scale and used as the oracle, but
the production path is MinHash-LSH: signature cost is linear in tokens,
banding bounds the join to same-bucket candidates, and verification is
linear in candidates. SimHash is the cheapest near-dup signal (single
64-bit signature; hamming via ``bit_count(xor)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.cache import (
    cache_scope,
    collect_release,
    scoped_persist,
)
from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t

# Fixed MinHash permutation parameters (seed pinned — LSH must be
# deterministic run-to-run for resumable 100 TB jobs).
_MINHASH_PERMS = 64
_LSH_BAND_ROWS = 2  # 32 bands × 2 rows → catches Jaccard ≥ ~0.3 candidates
# 2^31-1: params and base hashes stay below 31 bits so (a·h+b) never
# overflows a 64-bit long (universal hashing needs exact arithmetic).
_MERSENNE31 = (1 << 31) - 1
# Stop-shingle / hot-bucket cap for the APPROXIMATE pair-generation
# joins (LSH bands, winnow fingerprints): a key shared by d documents
# contributes d·(d−1)/2 candidate pairs, so one stop-shingle ("the of
# and …" boilerplate, a boilerplate license header) turns the self-join
# quadratic at corpus scale. A key this common carries no dedup signal
# — near-dup pairs share many keys, so dropping the hottest loses
# recall only for pairs whose EVERY shared key is corpus-boilerplate.
# 256 is a no-op at test scale (max observed bucket ≪ 100) and bounds
# any bucket to ≤ 32k candidate pairs at any scale. The exact-Jaccard
# operator keeps its uncapped oracle semantics.
_HOT_KEY_CAP = 256


def _hex15_col(c):
    """Engine-agreeing 60-bit hash: the first 15 hex chars of md5,
    parsed as an integer. Spark (conv) and DuckDB (positional hex-digit
    fold — see ``_duck_hex15``) compute the IDENTICAL value, which is
    what converts the simhash/winnow queries from rows-only driver
    checks into full value-hash rows (VERDICT r8 task 5): every
    signature-derived output becomes recomputable by the oracle.
    xxhash64 stays the throughput leaf for the 100 TB path (md5 is
    ~5-10x slower per byte but still JVM-side codegen); both leaves
    share the entire pipeline above the hash."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _duck_hex15(mh: str) -> str:
    """DuckDB twin of ``_hex15_col`` over an md5-hex column ``mh``:
    h = Σ_i hexdigit(mh[i]) << 4*(15-i), i = 1..15 (60 bits, always
    non-negative, so ``>>`` agrees between engines)."""
    return (
        "("
        + " + ".join(
            f"((strpos('0123456789abcdef', substr({mh}, {i}, 1)) - 1)::BIGINT"
            f" << {4 * (15 - i)})"
            for i in range(1, 16)
        )
        + ")"
    )


_WINNOW_FOLD_P = 1 << 53  # keeps (a % P)*128 < 2^60: exact in BIGINT


def _winnow_bitfold(a, b):
    """Engine-agreeing gram combine: xor((a % 2^53)*128, b). Weaker
    mixing than the xxhash64(a, b) production fold but exactly
    replicable in DuckDB SQL — inputs and result stay positive and
    < 2^61, so the modulo, the multiply, and the xor agree bit-for-bit.
    Collision risk over a corpus's gram vocabulary stays ~n^2/2^60."""
    return (F.pmod(a, F.lit(_WINNOW_FOLD_P)) * 128).bitwiseXOR(b)


# (token_hash, gram_combine) leaf pair for the oracle-checked winnow
# query; the default xxhash64 pair is the throughput path.
_WINNOW_ENGINE_AGREEING = (_hex15_col, _winnow_bitfold)


def _cap_hot_keys(df: DataFrame, key: str, cap: int = _HOT_KEY_CAP) -> DataFrame:
    """Drop rows whose ``key`` value occurs in more than ``cap`` rows —
    the standard skew guard before a key-equality self-join.

    Hot keys are found with a groupBy-count (map-side partial
    aggregation → only per-key counts shuffle, not the payload) and
    removed with a broadcast anti-join: by construction at most
    total_rows/cap keys exceed the cap, so the hot-key list is tiny and
    the payload never shuffles just to be counted. The earlier
    window-count formulation shuffled the full exploded band/fingerprint
    table — and sent every hot key's rows to ONE task, recreating the
    exact skew it guards against.

    NULL-key rows are retained unconditionally (NULL never equals a hot
    key in the anti-join) — matching their fate in the downstream
    equality self-join, where NULL matches nothing and produces no
    pairs. Callers whose keys can be NULL and who consume the output
    outside a join must filter NULLs themselves.

    The registered pair generators no longer call this in their hot
    path — ``_bucket_pairs`` below gets the cap for free inside its one
    groupBy (measured 1.47 s vs 2.01 s min-of-3 at sf0.1 for minhash).
    This survives as the pre-guard for the checkpointed-signatures
    path at corpus scale (see _bucket_pairs' mega-bucket note), where
    both of its passes read a materialized relation.

    If the input subtree IS recomputed twice here (count pass +
    anti-join probe), leave it unpersisted: Spark races the eager
    broadcast stage and the probe stage into a cold cache's partition
    locks (measured 2.5× slower than just recomputing). Callers that
    persist should do so on the CAPPED output (one node, populated by
    whichever consumer runs first), not the input."""
    hot = df.groupBy(key).count().filter(F.col("count") > cap).select(key)
    return df.join(F.broadcast(hot), key, "left_anti")


def _bucket_lists(rows: DataFrame, key: str, cap: int = _HOT_KEY_CAP) -> DataFrame:
    """Group exploded ``(doc_id, key)`` rows into per-key doc-id
    buckets, dropping buckets larger than ``cap`` — the hot-key guard
    as a FREE filter on an aggregation the pair generation needs
    anyway, instead of _cap_hot_keys' separate count pass + anti-join.

    NULL keys are dropped up front: in the self-join form a NULL key
    matches nothing and yields no pairs; an unguarded groupBy would
    collect all NULL-keyed rows into one bucket and pair them with
    each other — a semantic change (current callers' keys are xxhash64
    outputs and never NULL; the filter makes the equivalence
    unconditional)."""
    return (
        rows.filter(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") <= cap)
    )


def _pairs_from_lists(buckets: DataFrame) -> DataFrame:
    """Emit each bucket's C(d, 2) ordered pairs (doc_a < doc_b)
    JVM-side from its sorted doc list: one row per (bucket, pair), so
    callers ``.distinct()`` (any-bucket-collision semantics, minhash)
    or ``groupBy(pair).count()`` (>= n shared keys, winnow)."""
    pair_arr = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + 2, F.size("ds")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.filter(F.size("ds") >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b")
    )


def _bucket_pairs(rows: DataFrame, key: str, cap: int = _HOT_KEY_CAP) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) from key-equality buckets in ONE
    shuffle of the exploded table. The prior shape — _cap_hot_keys then
    a self-join — shuffled it three times (count pass + both join
    sides) or, persisted, still paid the count pass plus cache
    population; this groupBy-collect_list form pays one shuffle and
    enforces the cap as a free size filter. Measured min-of-3 at sf0.1
    on dedup_minhash_lsh: 1.47 s vs 2.01 s (persisted capped
    self-join) vs 1.53 s (UNcapped self-join) — identical output rows.

    100 TB note: a bucket's doc list materializes in its reducer's
    aggregation buffer before the size filter drops it, so a
    pathological mega-bucket (millions of identical-signature docs —
    corpus-boilerplate) concentrates in one task. At that scale the
    exploded input reads from a checkpointed signatures table anyway;
    run _cap_hot_keys as a pre-guard there (its two passes then scan a
    materialized relation) and keep this single-shuffle shape for the
    surviving rows."""
    return _pairs_from_lists(_bucket_lists(rows, key, cap))


def _perm_params(n: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(42)
    return [(rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31)) for _ in range(n)]


def _shingles(text_col, k: int = 3):
    """Distinct k-word shingles as an array column (JVM higher-order
    functions — no Python per row)."""
    toks = F.split(text_col, " ")
    # Docs shorter than k tokens have no shingles: an unguarded
    # sequence(0, size-k) descends below zero (slice() throws) or emits
    # bogus short shingles; the oracle's range() correctly yields none.
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _shingle_hashes(text_col, k: int = 3):
    """Distinct 64-bit shingle hashes. All pairwise work joins/compares
    these 8-byte longs instead of the shingle strings — same set
    semantics (collision probability over a corpus's shingle vocabulary
    is ~n²/2⁶⁴), a fraction of the shuffle bytes.

    Computed WITHOUT materializing shingle strings: hash each token
    once, then fold k consecutive token hashes with xxhash64 via
    aligned ``slice``+``zip_with`` arrays (each slice is evaluated
    once, unlike element_at inside a lambda, which re-embeds its
    subtree per access — measured dead end). Measured ~1.6× faster
    than building+hashing the joined strings at sf0.1; the token
    array is hashed in one pass regardless of k."""
    toks = F.split(text_col, " ")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(th)
    win = n - (k - 1)  # number of k-windows when n >= k
    mixed = F.slice(th, 1, win)
    for off in range(1, k):
        mixed = F.zip_with(mixed, F.slice(th, off + 1, win), lambda x, y: F.xxhash64(x, y))
    return F.when(n >= k, F.array_distinct(mixed)).otherwise(F.array().cast("array<bigint>"))


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


_JACCARD_CTES = """
    toks AS (
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
    ),
    jpairs AS (
        SELECT doc_a, doc_b,
               round(c * 1.0 / (ca.n + cb.n - c), 6) AS jaccard
        FROM common
        JOIN cnt ca ON ca.doc_id = doc_a
        JOIN cnt cb ON cb.doc_id = doc_b
        WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.6
    )
"""

_JACCARD_ORACLE = f"WITH {_JACCARD_CTES} SELECT doc_a, doc_b, jaccard FROM jpairs"

# Containment reuses the jaccard CTE chain up to `common`/`cnt`
# (jpairs is simply unused) and applies the asymmetric threshold.
_CONTAINMENT_ORACLE = f"""
    WITH {_JACCARD_CTES}
    SELECT doc_a, doc_b,
           round(c * 1.0 / least(ca.n, cb.n), 6) AS containment,
           round(c * 1.0 / (ca.n + cb.n - c), 6) AS jaccard
    FROM common
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE c * 1.0 / least(ca.n, cb.n) >= 0.7
"""


@query("dedup_near_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (exact formulation): document pairs with 3-shingle Jaccard
    ≥ 0.6. Shingle-hash → explode → self-join on the 8-byte hash →
    per-pair common count → Jaccard. The Jaccard value is a ratio of
    exact integers, so it is bit-identical across engines (the oracle
    computes on shingle strings; hashing preserves the set sizes).

    Scale shape: set sizes come free from ``size(shs)`` (no counting
    aggregation); the self-join shuffles longs, not shingle strings;
    per-doc set sizes ride along the exploded rows so no extra join is
    needed afterwards. Cost remains Σ_shingle (docs_with_shingle)² —
    the oracle-checkable exact semantics; dedup_minhash_lsh is the
    100 TB path."""
    docs = t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return near_jaccard_pairs(docs)


def near_jaccard_pairs(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """The 3-shingle exact-Jaccard pair build behind
    :func:`dedup_near_jaccard`, over any ``(doc_id, text)`` frame —
    factored out so composed pipelines (pipeline_incremental_e2e's
    cluster-maintenance stage) reuse the attested semantics instead of
    copying them. Caller must hold an active cache_scope (the shingle
    persist registered here is released by the caller's scope exit)."""
    shingled = docs.select("doc_id", _shingle_hashes(F.col("text")).alias("shs"))
    # Persist (scoped): both self-join sides read this; without it the
    # whole shingle pipeline is recomputed per side. (At 100 TB this is
    # a checkpoint to a signatures table, not executor memory.)
    sh = scoped_persist(
        shingled.select("doc_id", F.size("shs").alias("n"), F.explode("shs").alias("h"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return pairs.filter(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


@query("dedup_containment_pairs", oracle=_CONTAINMENT_ORACLE, tags=("dedup",))
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (asymmetric formulation): document pairs with shingle-set
    CONTAINMENT ≥ 0.7 — c / min(|A|, |B|), the doc-inside-doc signal
    Jaccard structurally under-reports: a short document fully embedded
    in a long one has containment 1.0 but Jaccard |A|/|B|, which falls
    below any fixed threshold as the length ratio grows. Training-data
    dedup needs both: Jaccard for same-size near-dups, containment for
    quote/aggregation/expansion pairs. Both ratios are emitted (exact
    integer ratios, 6-dp rounded) so the asymmetry is visible per pair.

    Scale shape: identical to dedup_near_jaccard — the same persisted
    shingle relation, the same 8-byte-hash self-join, one extra
    ``least()`` in the post-aggregation filter; at corpus scale the
    candidate generation swaps to the banded LSH path unchanged
    (containment-style LSH wants per-doc signature NORMALIZATION by
    min-size, which the verification step here already provides)."""
    docs = t(spark, sf_dir, "documents", spread=True).select(
        "doc_id", _shingle_hashes(F.col("text")).alias("shs")
    )
    sh = scoped_persist(
        docs.select("doc_id", F.size("shs").alias("n"), F.explode("shs").alias("h"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("c"))
    )
    cont = F.col("c") / F.least("na", "nb")
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return pairs.filter(cont >= 0.7).select(
        "doc_a",
        "doc_b",
        F.round(cont, 6).alias("containment"),
        F.round(jac, 6).alias("jaccard"),
    )


def _winnow_buckets(docs: DataFrame, cap: int = _HOT_KEY_CAP, fingerprints=None) -> DataFrame:
    """Per-fingerprint doc-id buckets (``fp``, sorted ``ds``) with
    corpus-hot fingerprints removed (bucket size > cap) — the shared
    input of the pair generation AND the containment invariant's
    eligibility gate (both must see the SAME post-cap set, or a doc
    whose every fingerprint is corpus-hot would be 'eligible' yet
    correctly unfindable).

    Physical shape (measured at sf0.1, min-of-3): the TOKEN-HASH array
    is materialized in its own small projection (54-element
    array<bigint> per row), and the fingerprint expression — gram
    fold, window minima, distinct — builds from slices of that COLUMN
    inside the explode generator. The fully-inline form re-evaluates
    the token-hash transform once per slice reference (3 gram slices ×
    4 window positions), which is what made the md5 leaf 5× slower
    (9.9 s vs 1.9 s; md5+conv per token is ~10× an xxhash64) and costs
    even the xxhash leaf ~0.7 s. Materializing the FINGERPRINT array
    instead remains the measured dead end the round-7 note recorded
    (codegen/JIT cliff): the cut point matters — hash once, fold from
    the column."""
    token_hash, combine = fingerprints or (F.xxhash64, lambda a, b: F.xxhash64(a, b))
    hashed = docs.select(
        "doc_id", F.transform(F.split("text", " "), lambda x: token_hash(x)).alias("th")
    )
    ex = hashed.select(
        "doc_id", F.explode(_winnow_fps_from_th(F.col("th"), combine)).alias("fp")
    )
    return _bucket_lists(ex, "fp", cap)


def _winnow_fps_from_th(th, combine, k: int = 3, window: int = 4):
    """Winnowing fingerprints from a MATERIALIZED token-hash array
    column ``th``: positional k-gram hashes via ``combine`` folds of
    aligned slices, minimum of every ``window`` consecutive gram
    hashes, deduplicated; <k-token docs yield no fingerprints, docs
    with 1 ≤ grams < window yield one (see winnow_fingerprints — same
    selection logic, different input cut)."""
    n = F.size(th)
    win = n - (k - 1)
    mixed = F.slice(th, 1, win)
    for off in range(1, k):
        mixed = F.zip_with(mixed, F.slice(th, off + 1, win), combine)
    seq = F.when(n >= k, mixed).otherwise(F.array().cast("array<bigint>"))
    m = F.size(seq)
    fps = F.transform(
        F.sequence(F.lit(0), m - window),
        lambda i: F.array_min(F.slice(seq, i + 1, window)),
    )
    return (
        F.when(m >= window, F.array_distinct(fps))
        .when(m >= 1, F.array(F.array_min(seq)))
        .otherwise(F.array().cast("array<bigint>"))
    )


def winnow_pairs_from_buckets(buckets: DataFrame) -> DataFrame:
    """Pairs over capped fingerprint buckets: document pairs sharing
    >= 2 (distinct — winnow_fingerprints deduplicates) fingerprints.
    Each bucket emits its pairs once, so the per-pair row count IS the
    shared-fingerprint count — one groupBy, no self-join."""
    return (
        _pairs_from_lists(buckets)
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= 2)
    )


def winnow_pairs_for(
    docs: DataFrame, cap: int = _HOT_KEY_CAP, fingerprints=None
) -> DataFrame:
    """Winnow-pair core over any ``(doc_id, text)`` DataFrame: document
    pairs sharing >= 2 winnowing fingerprints. Factored out of the
    registered query so the driver-attestable containment invariant
    (``dedup_winnow_containment``) can run it over a corpus augmented
    with constructed duplicates.

    ``cap`` drops fingerprints whose document frequency exceeds it
    (see ``_HOT_KEY_CAP`` — the stop-shingle skew guard; a fingerprint
    in hundreds of documents is boilerplate, not reuse signal). The
    cap is enforced as a free bucket-size filter inside the one
    groupBy (_bucket_lists), not a separate count pass."""
    return winnow_pairs_from_buckets(_winnow_buckets(docs, cap, fingerprints))


# DuckDB recomputes the full winnowing pipeline with the
# engine-agreeing leaves: per-token md5-60-bit hashes (positional),
# the exact bit-fold gram combine comb(a, b) = xor((a % 2^53)*128, b)
# (all values stay positive and < 2^61, so the modulo, the shift, and
# the xor agree bit-for-bit between engines), the minimum of every
# 4-hash window, per-doc distinct fingerprints, the 256-doc
# hot-fingerprint cap, and pairs sharing >= 2 surviving fingerprints.
# The 2000-row range mirrors _JACCARD_CTES (docs are far shorter).
_WINNOW_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, i, {_duck_hex15("mh")} AS h
        FROM (SELECT doc_id, i, md5(tk[i]) AS mh
              FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
                   range(1, 2000) r(i)
              WHERE i <= len(tk))
    ),
    th AS (SELECT doc_id, list(h ORDER BY i) AS th FROM tok GROUP BY doc_id),
    seqs AS (
        SELECT doc_id,
               CASE WHEN len(th) >= 3 THEN list_transform(
                   range(1, len(th) - 1), i ->
                   xor((xor((th[i] % 9007199254740992) * 128, th[i + 1]) % 9007199254740992) * 128,
                       th[i + 2]))
               ELSE []::BIGINT[] END AS seq
        FROM th
    ),
    fps AS (
        SELECT doc_id, unnest(CASE
            WHEN len(seq) >= 4 THEN list_distinct(list_transform(
                range(1, len(seq) - 2), i -> list_min(seq[i:i+3])))
            WHEN len(seq) >= 1 THEN [list_min(seq)]
            ELSE []::BIGINT[] END) AS fp
        FROM seqs
    ),
    hot AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) > 256)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared_fps
    FROM fps a JOIN fps b USING (fp)
    WHERE a.doc_id < b.doc_id AND fp NOT IN (SELECT fp FROM hot)
    GROUP BY 1, 2 HAVING count(*) >= 2
"""


@query("dedup_winnow_pairs", oracle=_WINNOW_ORACLE, tags=("dedup", "winnow"))
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 substring-reuse detector: document pairs sharing >= 2
    winnowing fingerprints (Schleimer et al. — the MOSS algorithm;
    see winnow_fingerprints below). Where shingle-Jaccard measures
    whole-document similarity, winnowing guarantees any shared token
    run of length >= k+window-1 shares a fingerprint — it catches a
    paragraph copied into an otherwise-different document, which
    Jaccard at 0.6 cannot.

    Runs the engine-agreeing leaves (md5-60-bit token hashes + the
    exact bit-fold gram combine, ``_WINNOW_ENGINE_AGREEING``) so the
    DuckDB oracle recomputes the identical fingerprint sets — a full
    rows+schema+hash driver row instead of the previous rows-only
    check (VERDICT r8 task 5). The xxhash64 leaves (the 100 TB
    throughput choice) share every structural stage and keep their own
    driver attestation via ``dedup_winnow_containment``; both run the
    same materialized-token-hash physical shape, which prices the md5
    leaf at ~the xxhash leaf (1.9 vs 2.1 s at sf0.1) instead of the 5x
    the inline form cost (see _winnow_buckets' cut-point note). Scale
    shape
    mirrors dedup_near_jaccard: in-scan array expressions, explode,
    8-byte-key bucket groupBy — on the ~1/window-sized fingerprint
    set, with hot fingerprints capped (``_HOT_KEY_CAP``)."""
    return winnow_pairs_for(
        t(spark, sf_dir, "documents", spread=True).select("doc_id", "text"),
        fingerprints=_WINNOW_ENGINE_AGREEING,
    )


def _minhash_sig_expr():
    """The 64-permutation MinHash signature as ONE array expression
    over an ``hs`` (distinct shingle hashes) column — per-doc compute,
    no explode, no shuffle. hs keeps full 64-bit hashes (verification
    Jaccard stays collision-free); permutations fold to 31 bits so
    a·h+b stays exact in a 64-bit long. ONE aggregate pass over the
    shingle array folds all 64 running minima at once (zip_with
    against a literal param-struct array) — measured ~1.7× faster
    than 64 separate transform+array_min scans, and each shingle's
    pmod is computed once instead of 64 times."""
    params = _perm_params(_MINHASH_PERMS)
    # One parsed literal, not 64 F.struct(F.lit, F.lit) calls — the
    # Column form costs ~0.3 s of py4j round-trips per query build.
    perm_lits = F.expr(
        "array("
        + ",".join(f"named_struct('a', {a}, 'b', {b})" for (a, b) in params)
        + ")"
    )
    return F.aggregate(
        "hs",
        F.array_repeat(F.lit(_MERSENNE31).cast("long"), _MINHASH_PERMS),
        lambda acc, h: F.zip_with(
            acc,
            perm_lits,
            lambda m, p: F.least(m, (p["a"] * F.pmod(h, F.lit(_MERSENNE31)) + p["b"]) % _MERSENNE31),
        ),
    )


def _band_keys_expr():
    """32 banded LSH keys over a ``sig`` column: each band key hashes
    its band index with its rows of the signature, so buckets from
    different bands can never collide."""
    n_bands = _MINHASH_PERMS // _LSH_BAND_ROWS
    # Parsed once — the per-band F.xxhash64(F.lit, ...) loop costs
    # ~0.25 s of py4j round-trips per query build (outputs verified
    # equal: int literals hash identically to F.lit ints).
    return F.expr(
        "array("
        + ",".join(
            f"xxhash64({i},"
            + ",".join(f"sig[{i * _LSH_BAND_ROWS + r}]" for r in range(_LSH_BAND_ROWS))
            + ")"
            for i in range(n_bands)
        )
        + ")"
    )


@query("dedup_minhash_lsh", oracle=None, tags=("dedup", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (scale formulation): MinHash signatures + banded LSH.

    Pipeline: shingle → one 64-bit base hash per shingle (xxhash64,
    JVM) → 64 universal-hash permutations ((a·h+b) mod 2^61−1) → min
    per (doc, perm) → 32 bands of 2 rows → docs agreeing on any band
    become candidates → candidates verified with EXACT Jaccard on their
    shingle sets → pairs ≥ 0.6.

    Cost at scale: signatures are computed entirely inside the scan
    task as array expressions — zero shuffle until banding (the naive
    shingle×perm row explosion shuffles |shingles|·64 rows; this
    shuffles |docs|·32 band keys, ONCE — candidate pairs come from a
    groupBy-collect_list per band bucket, not a self-join, so there is
    no second shuffle of the exploded table and the hot-bucket cap is
    a free size filter; see _bucket_pairs, measured 1.47 s vs 2.01 s
    min-of-3 at sf0.1). Verification touches candidate pairs only.
    Output ⊆ dedup_near_jaccard's (banding can miss pairs — P(miss) ≈
    (1−j²)³² ≈ 10⁻⁷ at j = 0.6), hence rows-only check + equality
    unit test vs the exact operator at test scale."""
    docs = t(spark, sf_dir, "documents", spread=True).select(
        "doc_id", _shingle_hashes(F.col("text")).alias("hs")
    )
    # Persist (scoped): the candidate self-join and both verification
    # sides all read signatures; unpersisted, the 64-permutation
    # pipeline would re-run once per consumer. (At 100 TB: checkpoint
    # to a signatures table instead.)
    signed = scoped_persist(docs.select("doc_id", "hs", _minhash_sig_expr().alias("sig")))
    band_keys = _band_keys_expr()
    # Candidate pairs per band bucket via ONE groupBy of the exploded
    # band table (_bucket_pairs). The hot-bucket cap rides along as a
    # free size filter: a band bucket holding d docs yields d·(d−1)/2
    # candidates, so one boilerplate-heavy bucket is quadratic at
    # corpus scale; docs this similar to >cap others still pair through
    # their OTHER 31 bands unless every band is equally hot (i.e. the
    # docs are boilerplate — no dedup signal lost). No-op at test scale
    # (max bucket ≪ cap); containment (LSH ⊆ exact) is unaffected
    # because capping only DROPS candidates. A pair colliding in
    # several bands is emitted once per band → distinct before
    # verification, or duplicates double-verify.
    candidates = _bucket_pairs(
        signed.select("doc_id", F.explode(band_keys).alias("band_key")), "band_key"
    ).distinct()
    # Exact verification on candidates only (hash-set Jaccard).
    sa = signed.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    sb = signed.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size(F.array_union("hs_a", "hs_b"))
    jac = inter / union
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.6)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "dedup_lsh_containment",
    # The invariant IS the query: LSH output ⊆ exact-Jaccard output, so
    # the anti-join is empty and the oracle is the empty set with the
    # same schema. A banding bug / hash drift / threshold regression
    # materializes as >0 rows → driver rows/hash mismatch.
    oracle="SELECT CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b WHERE 1 = 0",
    tags=("dedup", "lsh", "invariant"),
)
def dedup_lsh_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attestable containment invariant for the approximate LSH
    path: every pair emitted by ``dedup_minhash_lsh`` must also be in
    the exact ``dedup_near_jaccard`` answer (banding only loses pairs,
    never invents them — verification re-checks exact Jaccard ≥ 0.6 on
    the full hash sets). Registered so the guarantee that was
    previously only a unit test becomes driver evidence.

    Output is empty by construction → materialized via
    ``collect_release`` so the two composed pipelines' scoped caches
    (signatures + shingle sets) are freed instead of outliving the
    query."""
    with cache_scope():
        lsh = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
        exact = dedup_near_jaccard(spark, sf_dir).select("doc_a", "doc_b")
        return collect_release(lsh.join(exact, ["doc_a", "doc_b"], "left_anti"))


def simhash_pairs_for(docs: DataFrame, token_hash=F.xxhash64) -> DataFrame:
    """SimHash-pair core over any ``(doc_id, text)`` DataFrame: 64-bit
    SimHash near-dup pairs at hamming ≤ 3. Factored out of the
    registered query so the driver-attestable duplicate invariant
    (``dedup_simhash_dupes_ok``) can run it over a corpus augmented
    with constructed duplicates.

    ``token_hash`` is the per-token hash leaf: xxhash64 (default — the
    throughput choice; the completeness invariant runs it) or
    ``_hex15_col`` (engine-agreeing md5-60-bit — what the registered
    ``dedup_simhash`` runs so the DuckDB oracle can recompute every
    signature and hamming value). Everything above the leaf — voting,
    banding, verification — is shared.

    The 4×16-bit pigeonhole chunk join is deliberately UNCAPPED: the
    hamming ≤ 3 completeness guarantee (any such pair shares at least
    one identical chunk) is the operator's contract, and a frequency
    cap would silently void it. At corpus scale the skew story is the
    signature distribution itself — near-uniform for non-boilerplate
    text; boilerplate-heavy corpora should dedup exact/LSH first."""
    hashed = docs.select(
        "doc_id", F.transform(F.split("text", " "), lambda tok: token_hash(tok)).alias("hs")
    )

    # Bit b of the signature is the sign of Σ_tokens (±1) votes: set
    # when more than half the token hashes have bit b set. The 64
    # unrolled vote terms are ONE parsed expression — the per-bit
    # Column form costs ~1.4 s of py4j driver round-trips per query
    # build (outputs verified equal; shiftleft(1L, 63) wraps to the
    # same min-long two's-complement value the old b=63 special case
    # built explicitly).
    sig_sql = " + ".join(
        f"IF(size(filter(hs, h -> (shiftrightunsigned(h, {b}) & 1) = 1)) * 2"
        f" > size(hs), shiftleft(1L, {b}), 0L)"
        for b in range(64)
    )

    # Persist (scoped): both chunk-join sides read the signatures.
    sig = scoped_persist(hashed.select("doc_id", F.expr(sig_sql).alias("simhash")))
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


# DuckDB recomputes the ENTIRE simhash pipeline from scratch — the
# engine-agreeing md5-60-bit token hash (bits 60-63 always 0, so the
# effective signature is 60 bits and `>>` agrees between engines), the
# per-bit majority vote, and brute-force hamming ≤ 3 pairing (the
# Spark side's pigeonhole banding is candidate generation only; at
# 4 chunks × 16 bits it is complete for hamming ≤ 3, so brute force is
# the semantic twin). Signatures fold to two 30-bit halves so the pair
# scan is two xor+bit_count ops, not a 60-element list walk.
_SIMHASH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    th AS (
        SELECT doc_id, {_duck_hex15("mh")} AS h
        FROM (SELECT doc_id, md5(tok) AS mh FROM toks)
    ),
    hlists AS (SELECT doc_id, list(h) AS hs FROM th GROUP BY doc_id),
    sigs AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 30), b ->
                   CASE WHEN 2 * len(list_filter(hs, x -> ((x >> b) & 1) = 1)) > len(hs)
                        THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS lo,
               CAST(list_sum(list_transform(range(30, 60), b ->
                   CASE WHEN 2 * len(list_filter(hs, x -> ((x >> b) & 1) = 1)) > len(hs)
                        THEN (1::BIGINT << (b - 30)) ELSE 0::BIGINT END)) AS BIGINT) AS hi
        FROM hlists
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INTEGER) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE, tags=("dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 (cheapest signal): SimHash near-dup pairs at hamming ≤ 3 over
    the documents table (see ``simhash_pairs_for`` for the algorithm).

    Runs the engine-agreeing md5-60-bit token-hash leaf (``_hex15_col``)
    so every signature and hamming value is recomputable by the DuckDB
    oracle — a full rows+schema+hash driver row instead of the previous
    rows-only check (VERDICT r8 task 5). The xxhash64 throughput leaf
    shares the whole pipeline above the hash and keeps its own driver
    attestation via ``dedup_simhash_dupes_ok``.

    Scale shape: the signature is 64 array-filter expressions over the
    per-doc token-hash array — all inside the scan task, zero shuffle
    (the naive formulation explodes tokens×64 bit rows through two
    aggregations). First shuffle is the 4-chunk candidate join."""
    return simhash_pairs_for(
        t(spark, sf_dir, "documents", spread=True).select("doc_id", "text"),
        token_hash=_hex15_col,
    ).select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


# Constructed-duplicate invariants: the driver testdata has ZERO exact
# duplicate documents at sf0.001/sf0.01 (500 docs, 500 distinct texts),
# so the natural "exact-dup pairs must be found" invariant would be
# vacuously green. Instead the invariant queries CONSTRUCT duplicates —
# union the corpus with copies of its lowest-id documents under shifted
# ids — and assert the detectors find exactly those pairs. Non-vacuous
# at every scale factor, and the oracle stays computable by DuckDB from
# the corpus alone (the construction is pure doc_id arithmetic).
_DUP_OFFSET = 10_000_000  # far above any real doc_id at any SF
_N_SIMHASH_DUPES = 20
_N_WINNOW_DUPES = 40


def _with_constructed_dupes(docs: DataFrame, n: int, offset: int = _DUP_OFFSET) -> DataFrame:
    # Runtime guard: shifted ids are only collision-free while every
    # real doc_id stays below the offset. The check rides the projected
    # doc_id expression itself (a when/raise_error branch is not pruned
    # the way an unused assert column would be), so a future fixture
    # whose ids reach the offset fails THIS query loudly instead of
    # letting both constructed-dupe oracles silently mismatch.
    guarded_id = F.when(F.col("doc_id") < offset, F.col("doc_id")).otherwise(
        F.raise_error(
            F.format_string(
                "doc_id %s >= _DUP_OFFSET (%s): constructed-dupe ids would collide",
                F.col("doc_id").cast("string"),
                F.lit(str(offset)),
            )
        )
    )
    base = docs.select(guarded_id.alias("doc_id"), "text")
    return base.unionByName(
        base.filter(F.col("doc_id") < n).select(
            (F.col("doc_id") + offset).alias("doc_id"), "text"
        )
    )


@query(
    "dedup_simhash_dupes_ok",
    # Nonempty constant oracle derived from the corpus: every
    # constructed duplicate pair must surface at hamming exactly 0.
    # A signature bug, banding bug, or verification drift loses rows
    # (or shifts hamming) → driver rows/hash mismatch. Nonempty by
    # construction, so the invariant can never pass vacuously.
    oracle=f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_a,
               CAST(doc_id + {_DUP_OFFSET} AS BIGINT) AS doc_b,
               CAST(0 AS INTEGER) AS hamming
        FROM documents WHERE doc_id < {_N_SIMHASH_DUPES}
    """,
    tags=("dedup", "simhash", "invariant"),
)
def dedup_simhash_dupes_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attestable completeness invariant for SimHash: identical
    texts have identical signatures, so every constructed duplicate
    pair MUST appear at hamming 0 (pigeonhole banding cannot miss an
    identical chunk). Runs the full production pipeline — signature,
    banding, hamming verification — over corpus ∪ constructed dupes
    and returns the constructed pairs it found.

    Output is ``_N_SIMHASH_DUPES`` rows by construction → materialized
    via ``collect_release`` so the signature cache is freed."""
    with cache_scope():
        aug = _with_constructed_dupes(
            t(spark, sf_dir, "documents", spread=True), _N_SIMHASH_DUPES
        )
        found = (
            simhash_pairs_for(aug)
            .filter(F.col("doc_b") == F.col("doc_a") + _DUP_OFFSET)
            .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
        )
        return collect_release(found)


@query(
    "dedup_winnow_containment",
    # Empty-set oracle, same shape as dedup_lsh_containment: every
    # constructed duplicate pair whose document retains >= 2 distinct
    # fingerprints AFTER the hot-key cap must be found by the winnow
    # join, so the anti-join of constructed-minus-found is empty. (The
    # >= 2 gate mirrors the operator's own n_shared_fps >= 2 threshold
    # and is computed on the SAME capped fingerprint set the join sees
    # — a doc whose every fingerprint is corpus-hot is correctly
    # unfindable and correctly not eligible. Non-vacuity of the gated
    # set is unit-tested.)
    oracle="SELECT CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b WHERE 1 = 0",
    tags=("dedup", "winnow", "invariant"),
)
def dedup_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attestable inclusion invariant for winnowing: identical
    texts share their entire fingerprint set, so any constructed
    duplicate with >= 2 cap-surviving fingerprints must pair with its
    original. Runs the full production pipeline (fingerprints, hot cap,
    self-join) over corpus ∪ constructed dupes and returns the
    constructed pairs it MISSED — empty, or the driver gate fails.

    Output is empty by construction → ``collect_release`` frees the
    fingerprint cache."""
    with cache_scope():
        docs = t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
        # Persisted buckets (the capped OUTPUT — see _cap_hot_keys'
        # cache note): the eligibility gate and the pair generation
        # both read the same post-cap fingerprint buckets.
        buckets = scoped_persist(
            _winnow_buckets(_with_constructed_dupes(docs, _N_WINNOW_DUPES))
        )
        eligible = (
            buckets.select(F.explode("ds").alias("doc_id"))
            .filter(F.col("doc_id") < _N_WINNOW_DUPES)
            .groupBy("doc_id")
            .agg(F.count("*").alias("nfp"))
            .filter(F.col("nfp") >= 2)
            .select(
                F.col("doc_id").alias("doc_a"),
                (F.col("doc_id") + _DUP_OFFSET).alias("doc_b"),
            )
        )
        found = winnow_pairs_from_buckets(buckets).select("doc_a", "doc_b")
        return collect_release(eligible.join(found, ["doc_a", "doc_b"], "left_anti"))


# 0.45, not 0.5: the sf0.001 fixture's max pairwise cosine is ~0.479,
# so a 0.5 threshold is vacuously empty at the smallest SF and the
# oracle harness's vacuity gate rejects it. 0.45 yields a small
# nonempty answer at every SF (7 / 14 / 144 pairs at sf0.001/0.01/0.1).
_COSINE_THRESHOLD = 0.45

_COSINE_ORACLE = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= {_COSINE_THRESHOLD}
"""


# Block-kernel gate for the all-pairs cosine scan: at or below this
# many vectors the corpus matrix ships to every task (a bounded fetch:
# 32k × 64 dims × 8 B = 16 MiB) and each task scores its Arrow batches
# against it with a vectorized DIMENSION-ORDER fold — bitwise identical
# to the JVM `aggregate(zip_with(...))` sequential fold, because both
# evaluate acc = acc + a[d]·b[d] over the same doubles in the same
# order (IEEE 754 ops are deterministic; neither path fuses or
# reassociates). Above the gate the original join form runs unchanged —
# the operator is the O(n²) oracle twin either way (the honest scale
# path is the LSH/IVF candidate generator, see the docstring).
_COSINE_BLOCK_MAX = 32_768


def _single_threaded_blas():
    """Pin BLAS to one thread in THIS process — a Spark task already
    owns exactly one core, so BLAS-internal threading is pure spin-wait
    contention: 32 concurrent workers each spinning a 2-thread OpenBLAS
    pool measured 28.5 s wall for GEMM work that takes 2.1 s
    single-threaded (sf1, 32 procs × 625×20000×64). Two layers because
    Python workers are REUSED: env vars steer a fresh worker's first
    numpy import; the ctypes call reconfigures a worker whose numpy
    (and BLAS pool) is already live from an earlier task."""
    import os

    for v in (
        "OPENBLAS_NUM_THREADS",
        "OMP_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
    ):
        os.environ.setdefault(v, "1")
    try:
        import ctypes
        import glob as _glob

        import numpy as _np

        base = os.path.dirname(_np.__file__)
        for pat in ("../numpy.libs/*openblas*", ".libs/*openblas*"):
            for p in _glob.glob(os.path.join(base, pat)):
                try:
                    lib = ctypes.CDLL(p)
                except OSError:
                    continue
                for sym in (
                    "openblas_set_num_threads64_",
                    "openblas_set_num_threads",
                ):
                    try:
                        getattr(lib, sym)(1)
                        return
                    except AttributeError:
                        continue
    except Exception:
        pass


def _dim_order_norms(mat):
    """sqrt of the d-order square fold — the exact float sequence of
    ``sqrt(aggregate(transform(v, x*x), 0.0, (s, x) -> s + x))``."""
    import numpy as np

    acc = np.zeros(mat.shape[0])
    for d in range(mat.shape[1]):
        acc += mat[:, d] * mat[:, d]
    return np.sqrt(acc)


def _cosine_pairs_blocked(emb: DataFrame) -> DataFrame:
    """All-pairs cosine ≥ threshold via a mapInArrow block kernel (the
    sim_topk_blocked device, guide-§4.2 shape): the gate-bounded corpus
    matrix is broadcast once per executor; each Arrow batch of rows is
    scored against it in NumPy with the dimension-order fold (see
    _COSINE_BLOCK_MAX — bitwise-equal doubles, so the emitted pair SET
    and every cos_sim value match the join form exactly; the final
    6-dp rounding stays in Spark so the rounding rule is the engine's
    own). Division semantics mirror the session's: under ANSI (the
    Spark 4 default, and what the join form does) a zero cosine
    denominator fails the query; under non-ANSI the NaN/±inf results
    flow through Spark's NaN-is-largest ``>=`` exactly like the join
    form's."""
    import numpy as np

    spark = emb.sparkSession
    try:
        ansi = spark.conf.get("spark.sql.ansi.enabled", "true").lower() == "true"
    except Exception:
        ansi = True
    tbl = emb.toArrow()
    ids = tbl.column("vec_id").to_numpy().astype(np.int64)
    mat = np.asarray(
        tbl.column("v").combine_chunks().flatten(), dtype=np.float64
    ).reshape(len(ids), -1)
    bc = spark.sparkContext.broadcast((ids, mat))

    def blocks(batches):
        _single_threaded_blas()  # BEFORE the worker's numpy import
        import numpy as np
        import pyarrow as pa

        b_ids, b_mat = bc.value
        n, dim = b_mat.shape
        nb = _dim_order_norms(b_mat)
        # chunk the batch side so the (chunk × n) score buffer stays
        # ~64 MiB regardless of corpus size under the gate
        chunk = max(1, (64 << 20) // (8 * max(1, n)))
        for batch in batches:
            m = batch.num_rows
            if m == 0:
                continue
            a_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            a_mat = np.asarray(
                batch.column("v").flatten(), dtype=np.float64
            ).reshape(m, -1)
            na = _dim_order_norms(a_mat)
            for s in range(0, m, chunk):
                A = a_mat[s : s + chunk]
                aid = a_ids[s : s + chunk]
                an = na[s : s + chunk]
                # Candidate generation by BLAS GEMM (compute-bound, ~10×
                # the 64-pass elementwise fold) with a margin that
                # dwarfs the reassociation error: |gemm − fold| ≤
                # dim·eps·‖a‖‖b‖ ≈ 1.4e-14 relative, margin 1e-9.
                upper = b_ids[None, :] > aid[:, None]
                with np.errstate(divide="ignore", invalid="ignore"):
                    denom = an[:, None] * nb[None, :]
                    if ansi and bool(np.any(upper & (denom == 0.0))):
                        raise ArithmeticError(
                            "[DIVIDE_BY_ZERO] zero cosine denominator "
                            "under ANSI division semantics (matches the "
                            "pair-join form's behavior)"
                        )
                    approx = (A @ b_mat.T) / denom
                    cand = upper & (
                        (approx >= _COSINE_THRESHOLD - 1e-9)
                        | np.isnan(approx)
                    )
                ai, bj = np.nonzero(cand)
                if not len(ai):
                    continue
                # Exact dimension-order fold ONLY on the candidates —
                # the emitted values are the JVM fold's doubles, bit
                # for bit; the margin guarantees no true pair was lost.
                va, vb = A[ai], b_mat[bj]
                acc = np.zeros(len(ai))
                for d in range(dim):
                    acc += va[:, d] * vb[:, d]
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = acc / (an[ai] * nb[bj])
                    keep = (sim >= _COSINE_THRESHOLD) | np.isnan(sim)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(aid[ai][keep], type=pa.int64()),
                        pa.array(b_ids[bj][keep], type=pa.int64()),
                        pa.array(sim[keep], type=pa.float64()),
                    ],
                    names=["vec_a", "vec_b", "cos_sim_raw"],
                )

    out = emb.mapInArrow(
        blocks, schema="vec_a long, vec_b long, cos_sim_raw double"
    )
    return out.select(
        "vec_a", "vec_b", F.round("cos_sim_raw", 6).alias("cos_sim")
    )


@query("dedup_embedding_cosine", oracle=_COSINE_ORACLE, tags=("dedup", "similarity"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D3 bridge: embedding near-dup pairs with cosine ≥ 0.45
    (see _COSINE_THRESHOLD — nonempty at every SF). Brute-force O(n²)
    pair scan — the oracle-checkable semantics; the LSH-bucketed scale
    path is sim_topk_ivf (similarity.py). All math in float64. At or
    below _COSINE_BLOCK_MAX vectors the scan runs as a NumPy block
    kernel whose dimension-order fold is bitwise-equal to the JVM
    ``aggregate(zip_with(...))`` form (measured ~50× the per-pair
    throughput of interpreted HOF expressions at sf1's 20k vectors);
    above it the original pair join runs unchanged."""
    n_vecs = t(spark, sf_dir, "embeddings").count()  # metadata count
    emb = t(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    if n_vecs <= _COSINE_BLOCK_MAX:
        return _cosine_pairs_blocked(emb)
    return _cosine_pairs_joined(emb)


def _cosine_pairs_joined(emb: DataFrame) -> DataFrame:
    """The original pair-join form of :func:`dedup_embedding_cosine`
    (JVM higher-order-function dot products) — the past-the-gate path,
    kept verbatim so the block kernel has an in-session A/B and
    equivalence twin."""
    with_norm = scoped_persist(
        emb.withColumn(
            "norm",
            F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x)),
        )
    )
    a = with_norm.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = with_norm.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    sim = dot / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim_raw", sim)
        .filter(F.col("cos_sim_raw") >= _COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )


def winnow_fingerprints(text_col, k: int = 3, window: int = 4):
    """Winnowing fingerprints (Schleimer et al., the MOSS algorithm):
    the POSITIONAL rolling k-gram hash sequence (no distinct — order
    matters), then the minimum of every ``window`` consecutive hashes,
    deduplicated. Guarantees ≥1 fingerprint per window of text, and a
    shared substring of length ≥ k+window−1 tokens always shares a
    fingerprint — the local-edit-robust digest the md5 whole-document
    fingerprint (text_fingerprint) cannot provide.

    Scale: pure scan-side array expressions like _shingle_hashes; the
    fingerprint set is ~1/window the shingle count, so the downstream
    group-or-join shuffles proportionally less.

    Expression-form convenience API over the SHARED selection core
    (``_winnow_fps_from_th`` — one copy of the gram-fold/window-min/
    short-doc logic); the bucket path materializes th first (see
    _winnow_buckets' cut-point note) but folds identically, so both
    produce the same fingerprint values."""
    th = F.transform(F.split(text_col, " "), lambda t: F.xxhash64(t))
    return _winnow_fps_from_th(th, lambda x, y: F.xxhash64(x, y), k, window)


@query("dedup_prefix_filter_join", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 scale technique: exact set-similarity join via PREFIX
    FILTERING (the ppjoin/AllPairs family — Bayardo et al. 2007,
    Xiao et al. 2008) — the scalable-EXACT counterpart to LSH: under
    any global token order, two sets with Jaccard ≥ t MUST share a
    token in their first n − ⌈t·n⌉ + 1 tokens, so candidate pairs
    explode only from that prefix (rarest-first order makes prefixes
    collide rarely), and the exact Jaccard verification runs on the
    candidates alone. Same output relation as dedup_near_jaccard, and
    the ORACLE IS the exhaustive all-shingles join — a hash match
    here is a machine-checked proof that the filter missed nothing at
    the threshold, not just a spot check.

    Exactness of the prefix bound: ⌈0.6·n⌉ computes as (3n+4) div 5 —
    pure integers, so both the prefix length and the final Jaccard
    ratio are engine-exact. Global order = (corpus frequency asc,
    hash asc): fully deterministic, and rarest-first minimizes bucket
    sizes (the frequency relation is the vocabulary-sized aggregate
    the unigram family already pays).

    Scale shape: the candidate generator explodes |prefix| ≈ 0.4·n
    tokens per doc instead of n, and bucket sizes follow TOKEN RARITY
    rather than raw frequency — measured at sf0.1: 299,304 candidate
    pairs vs 1,130,536 from the exhaustive generator (3.8× fewer)
    with the identical 256-pair result. Honest crossover (the
    bucket-pair lesson again): at THIS corpus the plain self-join
    still wins wall-clock (3.7 s vs 4.5 s min-of-3) because the
    frequency agg + prefix window cost more than the 0.8M avoided
    candidates; the filter pays off exactly when Σ(docs-per-shingle)²
    dominates — hot shingles, web-scale corpora — which is when the
    exhaustive join stops being runnable at all. One shuffle for the
    frequency agg, one doc-keyed window for the prefix rank, one
    bucket shuffle for candidates, two candidate-sized lookups —
    nothing quadratic in the corpus."""
    docs = scoped_persist(
        t(spark, sf_dir, "documents", spread=True).select(
            "doc_id", _shingle_hashes(F.col("text")).alias("shs")
        )
    )
    full = docs.select(
        "doc_id", F.size("shs").alias("n"), F.explode("shs").alias("h")
    )
    freq = full.groupBy("h").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("doc_id").orderBy("f", "h")
    # Post-rank f >= 2 filter (AllPairs singleton pruning): a
    # corpus-unique token forms a singleton bucket and singleton
    # buckets emit zero pairs in _bucket_pairs, while rarest-FIRST
    # ordering puts exactly those tokens at the front of every prefix —
    # so dropping them AFTER the rank (the rank must see the full
    # order) can never change the candidate set (verified: 299,304
    # candidates with and without at sf0.1). On THIS shared-vocabulary
    # fixture only 0.2% of prefix rows are corpus-unique so the local
    # win is nil; on a rare-token-heavy real corpus the prefix is
    # MOSTLY f=1 tokens and this is the standard ppjoin shrink.
    prefix = (
        full.join(freq, "h")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("n") - F.expr("(3 * n + 4) div 5") + 1)
        .filter(F.col("f") >= 2)
        .select("doc_id", "h")
    )
    cand = _bucket_pairs(prefix, "h").distinct()
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb"))
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("c", F.size(F.array_intersect("sa", "sb")))
        .withColumn("na", F.size("sa"))
        .withColumn("nb", F.size("sb"))
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return verified.filter(jac >= 0.6).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


# --- round-15 wave F: edit-distance verification ---------------------

_LEV_ORACLE = f"""
    WITH {_JACCARD_CTES},
    tx AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS ln
        FROM documents
    )
    SELECT p.doc_a, p.doc_b,
           ta.ln AS len_a, tb.ln AS len_b,
           CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev_distance,
           CASE WHEN greatest(ta.ln, tb.ln) = 0 THEN CAST(1000000 AS BIGINT)
                ELSE CAST((greatest(ta.ln, tb.ln)
                           - levenshtein(ta.text, tb.text)) * 1000000
                          // greatest(ta.ln, tb.ln) AS BIGINT)
           END AS lev_sim_micro
    FROM jpairs p
    JOIN tx ta ON ta.doc_id = p.doc_a
    JOIN tx tb ON tb.doc_id = p.doc_b
"""


@query("dedup_levenshtein_verify", oracle=_LEV_ORACLE, tags=("dedup",))
def dedup_levenshtein_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 depth: EDIT-DISTANCE VERIFICATION of the near-dup candidate
    set — exact Levenshtein distance and normalized similarity for
    every pair the 3-shingle Jaccard stage surfaced. The classical
    two-stage dedup architecture: a cheap set-similarity RECALL stage
    proposes, a character-exact PRECISION stage disposes (shingle
    Jaccard is blind to within-shingle edits and word-order swaps
    that edit distance sees, and vice versa — a pair passing both is
    a near-dup with high confidence).

    Exact integers: both engines implement standard Wagner-Fischer
    Levenshtein over the same strings, and the normalized similarity
    (maxlen − lev)·1e6 div maxlen is one truncating division
    (equal empty strings pin 1e6 by convention).

    Scale shape: the O(len²)-per-pair dynamic program runs ONLY on
    the candidate pairs (bounded by the near-dup density, never
    |docs|²) — that asymmetry IS the two-stage design; the text
    lookups are two equi-joins of the tiny pair relation against the
    column-pruned (doc_id, text) scan. At 100 TB the candidate
    relation is the LSH banding output instead (dedup_minhash_lsh),
    same verify stage unchanged."""
    docs = t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    pairs = near_jaccard_pairs(docs).select("doc_a", "doc_b")
    tx = docs.select(
        "doc_id", "text", F.length("text").cast("long").alias("ln")
    )
    ta = tx.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
        F.col("ln").alias("len_a"),
    )
    tb = tx.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
        F.col("ln").alias("len_b"),
    )
    j = pairs.join(ta, "doc_a").join(tb, "doc_b")
    return j.select(
        "doc_a",
        "doc_b",
        "len_a",
        "len_b",
        F.levenshtein("text_a", "text_b").cast("long").alias("lev_distance"),
        F.expr(
            "CASE WHEN greatest(len_a, len_b) = 0 THEN CAST(1000000 AS BIGINT)"
            " ELSE CAST(((greatest(len_a, len_b)"
            "             - levenshtein(text_a, text_b)) * 1000000"
            "            - ((greatest(len_a, len_b)"
            "                - levenshtein(text_a, text_b)) * 1000000)"
            "              % greatest(len_a, len_b))"
            "           / greatest(len_a, len_b) AS BIGINT) END"
        ).alias("lev_sim_micro"),
    )
