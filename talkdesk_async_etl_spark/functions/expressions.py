"""Shared column expressions — the engine's scalar vocabulary.

Centralizing these keeps every query on the same JVM-side formulation
(identical plans, identical oracle semantics) instead of re-deriving
expressions per call site.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def revenue(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """TPC-H revenue expression."""
    return F.col(price) * (1 - F.col(discount))


def charge(price: str = "l_extendedprice", discount: str = "l_discount", tax: str = "l_tax") -> Column:
    return F.col(price) * (1 - F.col(discount)) * (1 + F.col(tax))


def dot(a, b) -> Column:
    """Vector dot product over two array<double> columns (JVM
    higher-order functions — no UDF)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(v) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def as_double_array(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def count_if(cond: Column) -> Column:
    """Conditional count — the reference's SUM(CASE WHEN ...) idiom
    (README.md:447-457)."""
    return F.sum(F.when(cond, 1).otherwise(0))


def normalized_text(col) -> Column:
    """Whitespace-collapsed, lowercased, trimmed text (fingerprint
    normalization)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def salted_join(fact, dim, key: str, n_salts: int = 8, how: str = "inner"):
    """Skew-mitigated equi join: a hot key that would land one shuffle
    partition with 10^9 rows is split across ``n_salts`` partitions by
    salting the fact side randomly and replicating the (small) dim side
    across every salt value. AQE's skew-join splitting covers
    sort-merge joins automatically; this explicit form is for when the
    dim side is too big to broadcast but small enough to replicate
    n_salts times, or when AQE is unavailable (streaming joins).

    Cost: dim side grows ×n_salts (an explode, no extra shuffle rounds);
    the fact side's hot keys spread evenly across salted partitions."""
    from pyspark.sql import DataFrame

    assert isinstance(fact, DataFrame) and isinstance(dim, DataFrame)
    salted_fact = fact.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_dim = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")
