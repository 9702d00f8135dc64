"""Mergeable Apache Datasketches operators: KLL quantile sketches and
theta distinct-count set algebra.

Extends SURVEY.md §2.4's aggregate surface (the reference only counts
and sums its monitoring rows, databricks/talkdesk_databricks_etl.py:
191-200) with the two sketch families a 100 TB pipeline standardizes
on beyond HLL (stats.py agg_hll_sketch_ok):

- **KLL** replaces exact percentiles where A10's ``percentile`` state
  is value-set-sized: sketch state is O(k log n) bytes regardless of
  row count, partial sketches merge associatively (map-side combine,
  per-batch rollup without rescanning history), and the rank error is
  bounded (~1.65% at the default k=200).
- **Theta** replaces exact COUNT DISTINCT where set ALGEBRA is needed:
  unlike HLL, theta sketches support intersection and difference, so
  "users who did A but not B" over billions of ids needs only two
  KB-sized sketches — never a distinct-join.

Both queries are invariant companions in the agg_hll_sketch_ok
pattern: the oracle pins the EXACT counts (real, hash-checked values
DuckDB recomputes) plus constant-TRUE tolerance flags; a sketch
update/merge/estimate bug flips a flag → driver hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t

# KLL default k=200 → ~1.65% single-sided rank error at 99% confidence;
# 5% is 3x that. The check is on RANKS (the quantity KLL bounds), not
# on quantile VALUES (which carry no distribution-free guarantee).
_KLL_RANK_TOL = 0.05


@query(
    "agg_kll_quantiles_ok",
    oracle="""
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_rows,
               (SELECT CAST(count(DISTINCT event_type) AS BIGINT)
                FROM events) AS n_groups,
               CAST(1 AS BOOLEAN) AS groups_p50_ok,
               CAST(1 AS BOOLEAN) AS merged_p50_ok,
               CAST(1 AS BOOLEAN) AS merged_p90_ok
    """,
    tags=("agg", "sketch", "invariant"),
)
def agg_kll_quantiles_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (Datasketches KLL,
    ``kll_sketch_agg_double``/``kll_merge_agg_double``): sketch the
    event-value distribution per event type, MERGE the per-group
    sketches into an overall sketch — never re-touching raw values —
    and attest that every estimated quantile's true rank is within
    ±5% of its target rank.

    The attestation recomputes each estimate's exact rank with one
    extra pass (fraction of values <= estimate): per-group estimates
    broadcast-join back onto the fact scan; the merged estimates ride
    a 1-row broadcast cross join. That exact pass is the expensive
    path the sketch replaces — at 100 TB only the sketch pipeline
    runs: per-partition KLL state is ~KBs, the shuffle moves sketches
    instead of doubles, and per-batch sketches roll up incrementally
    (merge 365 daily sketches instead of rescanning a year)."""
    ev = t(spark, sf_dir, "events", spread=True)
    per = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    merged = per.agg(
        F.expr("kll_merge_agg_double(sk)").alias("msk"),
        F.count("*").alias("n_groups"),
    ).select(
        F.expr("kll_sketch_get_quantile_double(msk, 0.5)").alias("m50"),
        F.expr("kll_sketch_get_quantile_double(msk, 0.9)").alias("m90"),
        "n_groups",
    )
    # Exact rank of each per-group p50 estimate, via broadcast join of
    # the |groups|-row estimate relation onto the fact scan.
    per_est = per.select(
        "event_type",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("e50"),
    )
    groups_ok = (
        ev.join(F.broadcast(per_est), "event_type")
        .groupBy("event_type")
        .agg(F.avg((F.col("value") <= F.col("e50")).cast("double")).alias("r50"))
        .agg(
            F.bool_and(F.abs(F.col("r50") - 0.5) <= _KLL_RANK_TOL).alias(
                "groups_p50_ok"
            )
        )
    )
    # Exact ranks of the merged estimates, via 1-row broadcast.
    merged_ok = (
        ev.crossJoin(F.broadcast(merged))
        .agg(
            F.count("*").alias("n_rows"),
            F.max("n_groups").alias("n_groups"),
            F.avg((F.col("value") <= F.col("m50")).cast("double")).alias("r50"),
            F.avg((F.col("value") <= F.col("m90")).cast("double")).alias("r90"),
        )
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_groups").cast("long").alias("n_groups"),
            (F.abs(F.col("r50") - 0.5) <= _KLL_RANK_TOL).alias("merged_p50_ok"),
            (F.abs(F.col("r90") - 0.9) <= _KLL_RANK_TOL).alias("merged_p90_ok"),
        )
    )
    return merged_ok.crossJoin(F.broadcast(groups_ok)).select(
        "n_rows", "n_groups", "groups_p50_ok", "merged_p50_ok", "merged_p90_ok"
    )


# Theta default lgK=12 (4096 retained hashes) → ~1.6% rse in estimation
# mode; below 4096 distinct values the sketch is EXACT. Intersection /
# difference errors are bounded relative to the UNION size (the
# Datasketches guidance), so every flag tolerates 5% of |A ∪ B|.
_THETA_TOL = 0.05


@query(
    "agg_theta_sketch_ok",
    oracle="""
        WITH s AS (
            SELECT count(DISTINCT CASE WHEN o_orderstatus = 'F'
                                       THEN o_custkey END) AS a,
                   count(DISTINCT CASE WHEN o_orderstatus = 'O'
                                       THEN o_custkey END) AS b,
                   count(DISTINCT CASE WHEN o_orderstatus IN ('F', 'O')
                                       THEN o_custkey END) AS u
            FROM orders
        )
        SELECT CAST(a AS BIGINT) AS exact_a,
               CAST(b AS BIGINT) AS exact_b,
               CAST(u AS BIGINT) AS exact_union,
               CAST(a + b - u AS BIGINT) AS exact_inter,
               CAST(u - b AS BIGINT) AS exact_diff,
               CAST(1 AS BOOLEAN) AS a_ok,
               CAST(1 AS BOOLEAN) AS b_ok,
               CAST(1 AS BOOLEAN) AS union_ok,
               CAST(1 AS BOOLEAN) AS inter_ok,
               CAST(1 AS BOOLEAN) AS diff_ok
        FROM s
    """,
    tags=("agg", "sketch", "invariant"),
)
def agg_theta_sketch_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra (``theta_sketch_agg`` +
    ``theta_union``/``theta_intersection``/``theta_difference``):
    sketch the customer sets behind finished ('F') and open ('O')
    orders in ONE scan, then estimate |A|, |B|, |A ∪ B|, |A ∩ B| and
    |A \\ B| purely from the two sketches — attested against exact
    counts within 5% of the union size.

    The single aggregate also computes the three exact distinct counts
    (inter/diff follow by inclusion-exclusion, so no distinct-join is
    ever needed), making this one scan + one aggregation total. At
    100 TB only the sketch half runs: per-partition theta state is
    bounded by lgK regardless of cardinality, and "customers who
    ordered in Q1 but never since" becomes a difference of two stored
    KB-sized sketches instead of an anti-join over billions of keys."""
    o = t(spark, sf_dir, "orders", spread=True)
    pre = o.where(F.col("o_orderstatus").isin("F", "O")).select(
        "o_custkey", (F.col("o_orderstatus") == "F").alias("in_a")
    )
    agg = pre.agg(
        F.expr("theta_sketch_agg(CASE WHEN in_a THEN o_custkey END)").alias("ska"),
        F.expr("theta_sketch_agg(CASE WHEN NOT in_a THEN o_custkey END)").alias(
            "skb"
        ),
        F.count_distinct(F.when(F.col("in_a"), F.col("o_custkey"))).alias(
            "exact_a"
        ),
        F.count_distinct(F.when(~F.col("in_a"), F.col("o_custkey"))).alias(
            "exact_b"
        ),
        F.count_distinct("o_custkey").alias("exact_union"),
    )
    tol = F.greatest(F.lit(1.0), F.lit(_THETA_TOL) * F.col("exact_union"))

    def ok(est_sql: str, exact_col) -> F.Column:
        return F.abs(F.expr(est_sql) - exact_col) <= tol

    return agg.select(
        "exact_a",
        "exact_b",
        "exact_union",
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).alias(
            "exact_inter"
        ),
        (F.col("exact_union") - F.col("exact_b")).alias("exact_diff"),
        ok("theta_sketch_estimate(ska)", F.col("exact_a")).alias("a_ok"),
        ok("theta_sketch_estimate(skb)", F.col("exact_b")).alias("b_ok"),
        ok(
            "theta_sketch_estimate(theta_union(ska, skb))", F.col("exact_union")
        ).alias("union_ok"),
        ok(
            "theta_sketch_estimate(theta_intersection(ska, skb))",
            F.col("exact_a") + F.col("exact_b") - F.col("exact_union"),
        ).alias("inter_ok"),
        ok(
            "theta_sketch_estimate(theta_difference(ska, skb))",
            F.col("exact_union") - F.col("exact_b"),
        ).alias("diff_ok"),
    )


# Count-min: depth 4 × width 512. Overestimate-only by construction;
# per-query excess is ~N/width per hash row, and taking the min over 4
# rows makes excess > 4N/width vanishingly unlikely — and, for fixed
# data + fixed xxhash64 seeds, DETERMINISTIC, so the bound flag is
# stable across runs (the agg_approx_distinct_tol pattern).
_CMS_DEPTH = 4
_CMS_WIDTH = 512
_CMS_TOPK = 10


@query(
    "agg_cms_topk_ok",
    # The true top-10 counts are REAL oracle values (deterministic
    # tie-break on the key); the two flags pin the CMS guarantees.
    oracle=f"""
        WITH c AS (
            SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
        )
        SELECT CAST(o_custkey AS BIGINT) AS custkey,
               CAST(cnt AS BIGINT) AS true_cnt,
               CAST(1 AS BOOLEAN) AS cms_overestimates_ok,
               CAST(1 AS BOOLEAN) AS cms_bound_ok
        FROM c ORDER BY cnt DESC, o_custkey LIMIT {_CMS_TOPK}
    """,
    tags=("agg", "sketch", "invariant"),
)
def agg_cms_topk_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (the frequency member of the sketch family,
    next to HLL/KLL/theta): estimate per-customer order counts from a
    4×512-cell sketch and attest, for the true top-10 customers, that
    the estimate (a) never underestimates — CMS's structural guarantee
    — and (b) overshoots by at most 4·N/width.

    Scale shape: the sketch build is explode(4 hash cells per row)
    with the (depth, bucket) hash-aggregate's MAP-SIDE partial combine
    collapsing every partition to ≤ 2048 cells before the exchange —
    the shuffle moves O(depth·width) cells per partition, never the
    fact rows, and cell counts merge associatively across
    batches/partitions (a CMS is a sum). Estimation probes the
    ≤ 2048-row sketch via broadcast. Everything is JVM-side
    (xxhash64 + pmod + explode) — no UDF. The exact top-10 pass
    exists only because the attestation needs the true counts; at
    100 TB only the sketch pipeline runs. Hash seeds are the depth
    index, so the sketch is reproducible across engines and rounds."""
    o = t(spark, sf_dir, "orders").select("o_custkey")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.col("o_custkey"), F.lit(d)), F.lit(_CMS_WIDTH)).alias(
                    "b"
                ),
            )
            for d in range(_CMS_DEPTH)
        ]
    )
    cms = (
        o.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.d").alias("d"), F.col("cell.b").alias("b"))
        .agg(F.count("*").alias("c"))
    )
    truth = (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("o_custkey").asc())
        .limit(_CMS_TOPK)
    )
    n_total = o.agg(F.count("*").alias("n_total"))
    probes = truth.select(
        "o_custkey",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.xxhash64(F.col("o_custkey"), F.lit(d)), F.lit(_CMS_WIDTH)
                        ).alias("b"),
                    )
                    for d in range(_CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("o_custkey", "true_cnt", F.col("cell.d").alias("d"), F.col("cell.b").alias("b"))
    est = (
        probes.join(F.broadcast(cms), ["d", "b"])
        .groupBy("o_custkey", "true_cnt")
        .agg(F.min("c").alias("est"))
    )
    return est.crossJoin(F.broadcast(n_total)).select(
        F.col("o_custkey").alias("custkey"),
        F.col("true_cnt").cast("long").alias("true_cnt"),
        (F.col("est") >= F.col("true_cnt")).alias("cms_overestimates_ok"),
        (
            (F.col("est") - F.col("true_cnt"))
            <= F.ceil(F.lit(4.0) * F.col("n_total") / _CMS_WIDTH)
        ).alias("cms_bound_ok"),
    )


@query(
    "agg_bitmap_distinct",
    # Every output is a REAL oracle value: plain exact distinct counts
    # — the bitmap pipeline must land on them exactly or the hash
    # breaks (bitmaps are exact, unlike the HLL/theta/CMS family).
    oracle="""
        WITH per AS (
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type
        ),
        tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total
                FROM events)
        SELECT per.event_type, per.n_users, tot.n_total
        FROM per, tot
    """,
    tags=("agg", "sketch"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via bitmaps — the fourth
    member of the cardinality family and the only exact one with
    sketch-like mergeability (HLL estimates, theta estimates with
    algebra, CMS is frequencies; a bitmap IS the set). Spark 3.5+'s
    ``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg`` / ``bitmap_or_agg`` / ``bitmap_count``
    shard the id space into disjoint 32k-bit buckets: per
    (group, bucket) the aggregate state is a fixed ≤4 KB bitmap
    regardless of row count, bitmaps OR-merge associatively (per-batch
    rollup, same as the HLL story but with zero error), and the
    distinct count is the sum of disjoint per-bucket popcounts. The
    per-type counts come from the construct level; the overall count
    re-MERGES the per-(type, bucket) bitmaps across types with
    ``bitmap_or_agg`` — attesting the merge path, not just the build.
    At 100 TB this is the exact-count design when ids are dense
    integers; sparse/wide id spaces flip to HLL (bounded state) or
    theta (algebra)."""
    ev = t(spark, sf_dir, "events", spread=True)
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )
    total = (
        per_bucket.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("obm"))
        .agg(F.sum(F.expr("bitmap_count(obm)")).alias("n_total"))
    )
    return per_type.crossJoin(F.broadcast(total)).select(
        "event_type", "n_users", "n_total"
    )


_AMS_K = 16  # independent sign-hash counters; rel. std err ~ sqrt(2/k)


def _ams_sign_sql(key: str, i: int, dialect: str) -> str:
    """±1 sign hash for counter ``i``: bit ``i`` of the md5 of the
    (salted) key — the 4-wise-independent-enough stand-in both
    engines evaluate identically (md5 is the repo's engine-agreeing
    hash leaf). Returns SQL yielding BIGINT +1/-1."""
    if dialect == "duck":
        digest = f"md5(concat(CAST({key} AS VARCHAR), '#ams{i}'))"
        nib = f"CAST(('0x' || substr({digest}, 1, 1)) AS INTEGER)"
    else:
        digest = f"md5(concat(CAST({key} AS STRING), '#ams{i}'))"
        nib = f"CAST(conv(substr({digest}, 1, 1), 16, 10) AS INT)"
    return f"(CASE WHEN {nib} % 2 = 1 THEN 1 ELSE -1 END)"


def _ams_oracle() -> str:
    z_cols = ", ".join(
        f"CAST(sum(n * {_ams_sign_sql('user_id', i, 'duck')}) AS BIGINT) AS z{i}"
        for i in range(_AMS_K)
    )
    est = "(" + " + ".join(f"z{i} * z{i}" for i in range(_AMS_K)) + f") // {_AMS_K}"
    return f"""
    WITH grain AS (
        SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    sketch AS (
        SELECT event_type, {z_cols}
        FROM grain GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, CAST(sum(n * n) AS BIGINT) AS f2
        FROM grain GROUP BY 1
    )
    SELECT s.event_type,
           e.f2 AS exact_f2,
           CAST({est} AS BIGINT) AS ams_estimate,
           CAST(abs(CAST({est} AS BIGINT) - e.f2) * 2 <= e.f2 AS BOOLEAN)
               AS within_tol
    FROM sketch s JOIN exact e ON s.event_type = e.event_type
    """


@query("agg_ams_f2_ok", oracle=_ams_oracle(), tags=("agg", "sketch"))
def agg_ams_f2_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A38: AMS (Alon-Matias-Szegedy) second-moment sketch — F2 =
    Σ_x c_x² is the SELF-JOIN SIZE, the statistic every cost-based
    optimizer wants before picking a join strategy and the skew
    number behind "will this key explode". The sketch keeps k=16
    signed counters Z_i = Σ_x c_x·s_i(x) (±1 sign hashes); E[Z²] =
    F2, and averaging the k squares bounds the relative error by
    ~sqrt(2/k). Because the sign hashes derive from md5 — the repo's
    engine-agreeing hash leaf — the WHOLE sketch is deterministic
    and the oracle recomputes estimate AND exact F2 AND the
    tolerance flag as real hash-checked values: unlike the HLL/
    theta/KLL family this sketch needs no rows-only concession, and
    a single flipped sign or dropped counter breaks the hash.

    Scale shape: counters fold map-side (each partition contributes
    k partial BIGINTs per group), merge associatively across batches
    (sum the Z's — per-day sketches answer any date range), and the
    exact-F2 branch exists only as the attestation: at 100 TB you
    keep the 128-byte sketch and drop the exact pass. The (type,
    user) grain collapse is the one corpus-sized exchange both
    branches share."""
    ev = t(spark, sf_dir, "events", spread=True)
    grain = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    z_aggs = [
        F.sum(
            F.col("n") * F.expr(_ams_sign_sql("user_id", i, "spark"))
        )
        .cast("long")
        .alias(f"z{i}")
        for i in range(_AMS_K)
    ]
    sketch = grain.groupBy("event_type").agg(*z_aggs)
    exact = grain.groupBy("event_type").agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("exact_f2")
    )
    est = "(" + " + ".join(f"z{i} * z{i}" for i in range(_AMS_K)) + f") DIV {_AMS_K}"
    return (
        sketch.join(exact, "event_type")
        .withColumn("ams_estimate", F.expr(f"CAST({est} AS BIGINT)"))
        .select(
            "event_type",
            "exact_f2",
            "ams_estimate",
            F.expr(
                "abs(ams_estimate - exact_f2) * 2 <= exact_f2"
            ).alias("within_tol"),
        )
    )
