"""Text-analysis operators (SURVEY.md §2.10 D4/D5 + north-star extras).

Language-ID, quality scoring, token counting (whitespace + regex
tokenizers), document fingerprinting, term statistics — the analysis
passes a large-scale training-data pipeline runs over raw text. All
JVM-side (split / higher-order functions / regexp), no Python per row;
every op here is a single scan + at most one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from talkdesk_async_etl_spark.plans.cache import scoped_persist
from talkdesk_async_etl_spark.plans.registry import query
from talkdesk_async_etl_spark.sources.io import read_table as t

# Tiny per-language marker lexicons for the n-gram/keyword language-ID
# heuristic. Real pipelines plug a fastText-style model in via
# mapInPandas; the heuristic keeps the operator fully SQL-expressible.
_LANG_MARKERS = {
    "de": ("der", "die", "und", "nicht"),
    "es": ("el", "los", "que", "por"),
    "fr": ("le", "les", "est", "une"),
    "zh": ("de5", "shi4", "le5", "zai4"),
}
_STOPWORDS = ("the", "a", "of", "and", "scan", "batch")


@query(
    "text_token_stats",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) * 1.0 / count(*) AS avg_tokens,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY lang
    """,
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: corpus token statistics per language — one scan, one
    shuffle, all aggregates in a single pass."""
    d = t(spark, sf_dir, "documents", spread=True).withColumn("n_tokens", F.size(F.split("text", " ")))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        # Exact int-sum / count division, unrounded: identical doubles
        # on both engines; a rounded avg can land on a round-half
        # boundary where the engines' rounding modes diverge.
        (F.sum("n_tokens").cast("long") * 1.0 / F.count("*")).alias("avg_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_quality_filter",
    oracle="""
        SELECT doc_id, lang, n_chars,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               round(len(list_filter(string_split(text, ' '),
                         x -> list_contains(['the','a','of','and','scan','batch'], x))) * 1.0
                     / len(string_split(text, ' ')), 6) AS stopword_ratio
        FROM documents
        WHERE n_chars BETWEEN 60 AND 400
          AND len(string_split(text, ' ')) >= 15
          AND lang IN ('en', 'de')
    """,
    tags=("text", "filter"),
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: quality gates — length bounds, minimum token count, language
    allow-list — plus a stopword-ratio quality score (the
    length/punct/stopword family of pretraining filters)."""
    d = t(spark, sf_dir, "documents", spread=True)
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return (
        d.withColumn("n_tokens", F.size(toks))
        .withColumn("stopword_ratio", F.round(n_stop * F.lit(1.0) / F.col("n_tokens"), 6))
        .filter(
            F.col("n_chars").between(60, 400)
            & (F.col("n_tokens") >= 15)
            & F.col("lang").isin("en", "de")
        )
        .select("doc_id", "lang", "n_chars", "n_tokens", "stopword_ratio")
    )


def _lang_case_sql() -> str:
    branches = []
    for lang, markers in _LANG_MARKERS.items():
        cond = " + ".join(
            f"len(list_filter(string_split(text, ' '), x -> x = '{m}'))" for m in markers
        )
        branches.append((lang, cond))
    score_cols = ", ".join(f"({cond}) AS score_{lang}" for lang, cond in branches)
    pick = (
        "CASE "
        + " ".join(
            f"WHEN score_{lang} > 0 AND score_{lang} >= score_de AND score_{lang} >= score_es "
            f"AND score_{lang} >= score_fr AND score_{lang} >= score_zh THEN '{lang}'"
            for lang in _LANG_MARKERS
        )
        + " ELSE 'en' END"
    )
    return f"""
        SELECT doc_id, lang AS labeled_lang, {pick} AS predicted_lang
        FROM (SELECT doc_id, lang, {score_cols} FROM documents)
    """


@query("text_lang_id", oracle=_lang_case_sql(), tags=("text",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/north star: keyword-lexicon language identification. Scores
    each document against per-language marker lexicons (token-exact
    matches, ties broken by lexicon order, default 'en'). The testdata
    corpus is synthetic word soup, so the heuristic mostly defaults —
    the operator verifies the scoring mechanism end-to-end against the
    oracle; production swaps the lexicons, not the plan."""
    d = t(spark, sf_dir, "documents", spread=True)
    toks = F.split("text", " ")

    # NB: the lambda must take exactly one parameter — a two-parameter
    # lambda is treated by F.filter as (element, index).
    def marker_count(m: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(m)))

    scores = {
        lang: sum((marker_count(m) for m in markers), F.lit(0))
        for lang, markers in _LANG_MARKERS.items()
    }
    d = d.select("doc_id", F.col("lang").alias("labeled_lang"), *[v.alias(f"score_{k}") for k, v in scores.items()])
    pred = F.lit(None).cast("string")
    expr = None
    for lang in _LANG_MARKERS:
        cond = (F.col(f"score_{lang}") > 0)
        for other in _LANG_MARKERS:
            cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{other}"))
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    pred = expr.otherwise("en")
    return d.select("doc_id", "labeled_lang", pred.alias("predicted_lang"))


@query(
    "text_fingerprint",
    oracle="""
        SELECT fingerprint,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
        FROM (
            SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
            FROM documents
        ) GROUP BY fingerprint
    """,
    tags=("text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/north star: document fingerprinting — md5 over
    whitespace-normalized, lowercased text; the 128-bit digest is what
    a 100 TB exact-dedup groups on instead of shipping full documents
    through the shuffle (same answer as dedup_exact, 1/50th the shuffle
    bytes here)."""
    d = t(spark, sf_dir, "documents", spread=True)
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
    )


@query(
    "text_token_count_regex",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_re_tokens,
               CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS INTEGER)
                   AS n_unique_tokens
        FROM documents WHERE doc_id % 7 = 0
    """,
    tags=("text",),
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/north star: token counting two ways — whitespace split and a
    BPE-ish regex tokenizer (letter runs | digit runs | single
    punctuation), plus unique-token counts. The regex stays in the
    shared RE2/Java-compatible subset so both engines tokenize
    identically."""
    d = t(spark, sf_dir, "documents", spread=True).filter(F.col("doc_id") % 7 == 0)
    # idx=0 = whole match (the pattern has no capture groups; Spark's
    # default idx=1 would error, DuckDB's default is already 0).
    re_toks = F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(re_toks).alias("n_re_tokens"),
        F.size(F.array_distinct(re_toks)).alias("n_unique_tokens"),
    )


@query(
    "text_split_assign",
    oracle="""
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2
    """,
    tags=("text", "sampling"),
)
def text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star: deterministic train/val/test assignment by content-
    independent hash bucket — md5(doc_id) first hex digit: 0-b → train
    (12/16), c-d → val (2/16), e-f → test (2/16). Hash-based splits are
    stable under reprocessing, joins, and re-partitioning (a random()
    split is none of those), and md5 is identical across engines so the
    assignment itself is oracle-checked, not just the counts' shape.
    At 100 TB the same expression becomes the sink's partition column
    so each split reads its own files."""
    d = t(spark, sf_dir, "documents", spread=True)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(bucket <= "b", "train").when(bucket <= "d", "val").otherwise("test")
    )
    return d.groupBy("lang", split.alias("split")).agg(F.count("*").alias("n_docs"))


@query(
    "text_dominant_term",
    oracle="""
        SELECT doc_id, term, CAST(n AS BIGINT) AS n FROM (
            SELECT doc_id, term, n,
                   row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, term ASC) AS rn
            FROM (
                SELECT doc_id, term, count(*) AS n
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
                GROUP BY doc_id, term
            )
        ) WHERE rn = 1
    """,
    tags=("text",),
)
def text_dominant_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: dominant term per document (mode with deterministic
    alphabetical tie-break) — explode → count → top-1 window. The
    explode/groupBy shape is the UDTF-equivalent surface from SURVEY.md
    §2.11."""
    d = t(spark, sf_dir, "documents", spread=True)
    terms = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    counts = terms.groupBy("doc_id", "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.col("n").desc(), F.col("term").asc())
    return counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
        "doc_id", "term", "n"
    )


# Chunking contract: fixed token windows with overlap (size 64, stride
# 48 → 16-token overlap), the shape LLM training pipelines feed
# tokenizers. Chunk count = 1 + max(0, ceil((n_tokens - size)/stride)).
_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48

# Per-row unnest(range(...)) derives each document's chunk-id range
# from its own token count — no fixed cap, so arbitrarily long
# documents can never diverge from the Spark formulation (an earlier
# draft cross-joined range(0, 200), silently capping 200 chunks/doc).
_CHUNK_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    ids AS (
        SELECT doc_id, tk,
               unnest(range(0, 1 + greatest(0,
                   CAST(ceil((len(tk) - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0) AS INT)))) AS i
        FROM toks
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           array_to_string(tk[i*{_CHUNK_STRIDE}+1 : i*{_CHUNK_STRIDE}+{_CHUNK_SIZE}], ' ') AS chunk_text,
           CAST(len(tk[i*{_CHUNK_STRIDE}+1 : i*{_CHUNK_STRIDE}+{_CHUNK_SIZE}]) AS INT) AS n_tokens
    FROM ids
"""


@query("text_chunk", oracle=_CHUNK_ORACLE, tags=("text", "chunk"))
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split each document into 64-token
    chunks at stride 48 (16-token overlap) — the unit a training
    pipeline tokenizes and packs. All inside the scan task: one
    ``sequence`` of chunk starts, ``slice``+``array_join`` per chunk,
    one explode; no shuffle at all (the output inherits the scan's
    partitioning, and a downstream tokenizer maps over it in place).
    At 100 TB the explode multiplies rows ~n_tokens/stride ×, which is
    why it must stay inside the scan rather than shuffling documents
    first."""
    d = t(spark, sf_dir, "documents", spread=True)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0),
        F.ceil((n - _CHUNK_SIZE) / F.lit(float(_CHUNK_STRIDE))).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(F.slice(toks, i * _CHUNK_STRIDE + 1, _CHUNK_SIZE), " ").alias("chunk_text"),
            F.least(n - i * _CHUNK_STRIDE, F.lit(_CHUNK_SIZE)).cast("int").alias("n_tokens"),
        ),
    )
    return d.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_id", "c.chunk_text", "c.n_tokens"
    )


# Conservative, engine-portable patterns (Java regex ∩ RE2): emails and
# long digit runs. Real pipelines extend the pattern set; the operator
# shape (regexp_replace chain + match counts, all JVM-side) is the point.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_NUMBER = r"[0-9]{7,}"


@query(
    "text_pii_scrub",
    oracle=f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                              '{_PII_NUMBER}', '<NUM>', 'g') AS scrubbed,
               CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{_PII_NUMBER}')) AS INT) AS n_numbers
        FROM documents
    """,
    tags=("text", "quality"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 companion: PII redaction pass — replace emails and long
    digit runs with typed placeholders and count what was hit (the
    counts feed the quality-gate stage). Pure ``regexp_replace`` /
    ``regexp_count`` expressions: one scan, zero shuffle, trivially
    100 TB-safe."""
    d = t(spark, sf_dir, "documents", spread=True)
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"), _PII_NUMBER, "<NUM>"
        ).alias("scrubbed"),
        F.regexp_count(F.col("text"), F.lit(_PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PII_NUMBER)).cast("int").alias("n_numbers"),
    )


_TFIDF_TOP_K = 3

_TFIDF_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term,
               round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term ASC) AS rn
        FROM scored
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, term, tfidf
    FROM ranked WHERE rn <= {_TFIDF_TOP_K}
"""


@query("text_tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("text",))
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 depth: per-document top-3 TF-IDF terms — the per-doc keyword
    signal quality filters and topic bucketing key on. One explode +
    two aggregations: term frequency per (doc, term), document
    frequency per term (a vocabulary-sized relation), then a
    smoothed-idf score ranked per document.

    Determinism across engines: both sides rank on the ROUNDED score
    with a term tie-break, so a last-ulp ln() difference inside the
    rounding grain cannot reorder ranks. Scale shape: the tf and df
    aggregations shuffle (doc,term) / term keys with map-side partials;
    the corpus-size literal joins in as a broadcast single row; the
    final ranking partitions by doc_id — no corpus-wide sort."""
    d = t(spark, sf_dir, "documents", spread=True)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf")
    )


_PACK_BUDGET = 256  # tokens per packed sequence (training context slot)
_PACK_SHARDS = 8  # independent packing shards; scales with the cluster


_PACK_ORACLE = f"""
    WITH RECURSIVE d AS (
        SELECT doc_id,
               CAST(doc_id % {_PACK_SHARDS} AS INTEGER) AS shard,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               row_number() OVER (PARTITION BY doc_id % {_PACK_SHARDS}
                                  ORDER BY doc_id) AS rn
        FROM documents
    ),
    packed(shard, rn, doc_id, n_tokens, pack_no, fill) AS (
        SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
               CASE WHEN p.fill + d.n_tokens <= {_PACK_BUDGET}
                    THEN p.pack_no ELSE p.pack_no + 1 END,
               CASE WHEN p.fill + d.n_tokens <= {_PACK_BUDGET}
                    THEN p.fill + d.n_tokens ELSE d.n_tokens END
        FROM packed p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
    )
    SELECT doc_id, shard, n_tokens, pack_no FROM packed
"""


@query("text_pack_sequences", oracle=_PACK_ORACLE, tags=("text", "packing", "udf"))
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4+: sequence packing — assign documents to fixed-token-budget
    training sequences (the pretraining data-prep step that fills a
    context window with whole documents instead of padding). Greedy
    first-fit in doc_id order within deterministic shards
    (``doc_id % {shards}``): walk the shard's docs in order, accumulate
    token counts, open a new pack when the next doc would overflow the
    budget. Packing is inherently sequential (each break depends on
    every earlier break), so it runs as ``applyInPandas`` per shard —
    the documented use of the grouped-UDF slow path for genuinely
    order-dependent logic; token counting itself stays JVM-side.

    Scale shape: ONE shuffle on the shard key; each shard packs
    independently (packs never cross shards — the standard trade: a
    little tail waste per shard for embarrassing parallelism), so at
    100 TB the shard count scales with the cluster and state per task
    is one (fill, pack_no) pair. The oracle replays the same greedy
    walk as a recursive CTE advancing one row per shard per step.

    Fully deterministic (no RNG, doc_id order) -> hash-checked."""
    import pandas as pd

    d = t(spark, sf_dir, "documents", spread=True).select(
        "doc_id",
        F.pmod("doc_id", F.lit(_PACK_SHARDS)).cast("int").alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs = []
        fill, pack_no = 0, 0
        first = True
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if first:
                fill, first = nt, False
            elif fill + nt <= _PACK_BUDGET:
                fill += nt
            else:
                pack_no += 1
                fill = nt
            packs.append(pack_no)
        pdf["pack_no"] = packs
        return pdf[["doc_id", "shard", "n_tokens", "pack_no"]]

    return d.groupBy("shard").applyInPandas(
        pack, schema="doc_id bigint, shard int, n_tokens int, pack_no bigint"
    )


_QUOTA_TOKENS = 2500  # per-language token budget (data-mixture weight)


@query(
    "text_lang_quota",
    oracle=f"""
        SELECT doc_id, lang, n_tokens, cum_tokens FROM (
            SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                   CAST(sum(len(string_split(text, ' '))) OVER (
                       PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM documents
        ) WHERE cum_tokens <= {_QUOTA_TOKENS}
    """,
    tags=("text", "window"),
)
def text_lang_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4+: data-mixture quota enforcement — keep each language's
    best documents up to a fixed token budget (how a pretraining mix
    pins per-language/per-source weights). Rank within language by
    quality (n_chars here, any score column in production) with a
    doc_id tie-break, running-sum the token counts, keep rows while
    the cumulative total is within budget.

    Scale shape: one shuffle on lang + per-partition sort (a window,
    same envelope as any W-family op). Language is a SKEWED partition
    key at corpus scale (en dominates); production splits the window
    key to (lang, source) sub-quotas or pre-computes the cutoff rank
    from a quantile sketch and filters by rank instead — both
    documented here, same semantics at the budget boundary."""
    d = t(spark, sf_dir, "documents", spread=True).withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= _QUOTA_TOKENS)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


# Repetition thresholds follow the Gopher/MassiveText quality rules
# (Rae et al. 2021, table A1 shape): a document whose n-gram stream is
# dominated by repeats is boilerplate/spam, not prose.
_REP_TRIGRAM_FLAG = 0.01

_REPETITION_ORACLE = f"""
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS n_words,
           CAST(n_uniq_words AS INTEGER) AS n_uniq_words,
           CAST(n_uniq_bigrams AS INTEGER) AS n_uniq_bigrams,
           CAST(n_uniq_trigrams AS INTEGER) AS n_uniq_trigrams,
           round((n_words - n_uniq_words) * 1.0 / n_words, 6) AS dup_word_frac,
           round((greatest(n_words - 1, 1) - n_uniq_bigrams) * 1.0
                 / greatest(n_words - 1, 1), 6) AS dup_bigram_frac,
           round((greatest(n_words - 2, 1) - n_uniq_trigrams) * 1.0
                 / greatest(n_words - 2, 1), 6) AS dup_trigram_frac,
           (greatest(n_words - 2, 1) - n_uniq_trigrams) * 1.0
               / greatest(n_words - 2, 1) > {_REP_TRIGRAM_FLAG} AS flagged
    FROM (
        SELECT doc_id,
               len(words) AS n_words,
               len(list_distinct(words)) AS n_uniq_words,
               len(list_distinct(list_transform(range(1, len(words)),
                   i -> array_to_string(words[i:i+1], ' ')))) AS n_uniq_bigrams,
               len(list_distinct(list_transform(range(1, len(words) - 1),
                   i -> array_to_string(words[i:i+2], ' ')))) AS n_uniq_trigrams
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        WHERE len(words) >= 3
    )
"""


@query("text_repetition_score", oracle=_REPETITION_ORACLE, tags=("text", "quality"))
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star D5: intra-document repetition signals — the
    Gopher-style "fraction of duplicate n-grams" family of pretraining
    quality scores. Per document: unique-word / unique-bigram /
    unique-trigram counts, the corresponding duplicate fractions, and a
    boilerplate flag when >1% of trigrams are repeats.

    Everything is array-native inside the scan (``split`` →
    ``transform``/``slice`` n-grams → ``array_distinct`` → ``size``):
    one scan, ZERO shuffle, no explode — the n-gram streams never leave
    their row, so at 100 TB this costs exactly one pass over the text
    column. The duplicate fractions are integer-count ratios rounded at
    6dp, so both engines round the identical double."""
    d = t(spark, sf_dir, "documents", spread=True)
    words = F.split("text", " ")
    n = F.size(words)

    def uniq_ngrams(width: int):
        grams = F.transform(
            F.sequence(F.lit(1), n - (width - 1)),
            lambda i: F.array_join(F.slice(words, i, width), " "),
        )
        return F.size(F.array_distinct(grams))

    d = (
        d.filter(n >= 3)
        .select(
            "doc_id",
            n.alias("n_words"),
            F.size(F.array_distinct(words)).alias("n_uniq_words"),
            uniq_ngrams(2).alias("n_uniq_bigrams"),
            uniq_ngrams(3).alias("n_uniq_trigrams"),
        )
    )
    nb = F.greatest(F.col("n_words") - 1, F.lit(1))
    ntr = F.greatest(F.col("n_words") - 2, F.lit(1))
    tri_frac = (ntr - F.col("n_uniq_trigrams")) * 1.0 / ntr
    return d.select(
        "doc_id",
        "n_words",
        "n_uniq_words",
        "n_uniq_bigrams",
        "n_uniq_trigrams",
        F.round((F.col("n_words") - F.col("n_uniq_words")) * 1.0 / F.col("n_words"), 6).alias(
            "dup_word_frac"
        ),
        F.round((nb - F.col("n_uniq_bigrams")) * 1.0 / nb, 6).alias("dup_bigram_frac"),
        F.round(tri_frac, 6).alias("dup_trigram_frac"),
        (tri_frac > _REP_TRIGRAM_FLAG).alias("flagged"),
    )


# Benchmark decontamination: word 4-grams, eval set = doc_id % 11 == 0
# (a deterministic stand-in for "the benchmark suite"). 4-grams at this
# corpus' doc length give a non-vacuous overlap at every test SF
# (probed: 53 contaminated docs at sf0.001, 71 at sf0.01).
_DECON_N = 4
_DECON_MOD = 11

_DECON_ORACLE = f"""
    WITH g AS (
        SELECT doc_id, unnest(grams) AS gram FROM (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(words) - {_DECON_N - 2}),
                       i -> array_to_string(words[i:i+{_DECON_N - 1}], ' '))) AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        )
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
    FROM g t
    JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_MOD} = 0) e USING (gram)
    WHERE t.doc_id % {_DECON_MOD} != 0
    GROUP BY t.doc_id
"""


@query("text_decontaminate", oracle=_DECON_ORACLE, tags=("text", "dedup"))
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star D5: benchmark decontamination — flag training
    documents that share any word 4-gram with the eval set, with the
    count of distinct matched 4-grams (the PaLM/GPT-3-style
    contamination check run before every pretraining job). Eval set
    here is the deterministic ``doc_id % 11 == 0`` slice.

    Scale shape: the eval side is SMALL by construction (benchmarks are
    thousands of docs, the corpus is billions), so its distinct
    4-gram set broadcasts and the corpus side never shuffles to
    match — each scan task joins its rows against the broadcast set
    in place. Per-doc grams are ``array_distinct``-ed inside the scan
    BEFORE the explode, so the post-join groupBy counts distinct
    matches with a plain count(*) — no second distinct shuffle. The
    only shuffle is the final per-doc count of MATCHED rows
    (contaminated grams only, a vanishing fraction of the corpus). At
    100 TB the broadcast set becomes a bloom-filter pre-pass with the
    same join as the exact confirmation on survivors.

    The gram expression is INLINED into each ``explode`` rather than
    materialized as an array column in a prior projection — the
    project-then-explode form trips the codegen/JIT cliff on this huge
    generated expression (measured 3.05 s vs 1.20 s min-of-3 at sf0.1;
    same gotcha as the winnow/minhash generators)."""
    d = t(spark, sf_dir, "documents", spread=True)
    words = F.split("text", " ")
    n = F.size(words)
    grams = F.when(
        n >= _DECON_N,
        F.transform(
            F.sequence(F.lit(1), n - (_DECON_N - 1)),
            lambda i: F.array_join(F.slice(words, i, _DECON_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gram = F.explode(F.array_distinct(grams)).alias("gram")
    eval_grams = d.filter(F.col("doc_id") % _DECON_MOD == 0).select(gram).distinct()
    train = d.filter(F.col("doc_id") % _DECON_MOD != 0).select("doc_id", gram)
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )


_LOGPROB_ORACLE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    freq AS (SELECT term, count(*) AS tf_global FROM toks GROUP BY term),
    tot AS (SELECT count(*) AS n_total FROM toks)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           round(avg(ln(tf_global / CAST(n_total AS DOUBLE))), 6) AS avg_logprob
    FROM toks JOIN freq USING (term) CROSS JOIN tot
    GROUP BY doc_id
"""


@query("text_unigram_logprob", oracle=_LOGPROB_ORACLE, tags=("text", "quality"))
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 depth: perplexity-style quality score without an external LM —
    per-document mean log-probability under the corpus's own unigram
    distribution. Low scores mark gibberish/rare-token documents, high
    scores mark boilerplate; pretraining curation pipelines (CCNet,
    Gopher) bucket on exactly this signal before the expensive
    KenLM/neural pass.

    Plan: one explode feeding two keyed aggregations — term frequency
    over the vocabulary (map-side partials make the shuffle
    vocabulary-sized, not token-sized), corpus token total as a
    broadcast single row (the scalar-subquery idiom, same as TF-IDF's
    n_docs) — then the vocabulary relation joins back to the token
    stream and a per-doc aggregate averages the log-probs. The
    vocabulary join is the one real shuffle; at 100 TB the vocabulary
    still fits the broadcast threshold after a mild frequency floor, so
    the production variant broadcasts it and the token stream never
    exchanges. Both engines round the mean to 6 dp so float summation
    order cannot flip the hash."""
    d = t(spark, sf_dir, "documents", spread=True)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    freq = toks.groupBy("term").agg(F.count("*").alias("tf_global"))
    tot = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.join(freq, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(
                F.avg(F.log(F.col("tf_global") / F.col("n_total").cast("double"))), 6
            ).alias("avg_logprob"),
        )
    )


_VOCAB_SIZE = 20

_VOCAB_OOV_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    nz AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tf AS (SELECT term, count(*) AS c FROM nz GROUP BY term),
    vocab AS (SELECT term FROM tf ORDER BY c DESC, term ASC LIMIT {_VOCAB_SIZE})
    SELECT nz.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           round(sum(CASE WHEN v.term IS NULL THEN 1.0 ELSE 0.0 END)
                 / count(*), 6) AS oov_rate
    FROM nz LEFT JOIN vocab v ON nz.term = v.term
    GROUP BY nz.doc_id
"""


@query("text_vocab_oov", oracle=_VOCAB_OOV_ORACLE, tags=("text",))
def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/D5 depth: vocabulary coverage — build the top-V (V=20)
    corpus vocabulary (frequency-ranked, term tie-break so the cut is
    deterministic on both engines) and score every document's
    out-of-vocabulary token rate, the coverage metric that decides
    tokenizer vocab sizing and flags corpora whose token distribution
    a fixed vocab would shred.

    Scale shape: the token explode never leaves its scan stage — the
    term-frequency aggregate partial-combines map-side (shuffle
    carries distinct terms, not token instances), the vocabulary is a
    TakeOrdered of that (top-V rows → broadcast), and the per-doc
    scoring pass re-explodes in-scan, left-joins the broadcast vocab,
    and partial-combines to one row per doc before its exchange. Two
    passes over the text is the honest cost (the vocab is a global
    statistic); at 100 TB the vocab build amortizes across every
    downstream scoring run — persist it as a table and the metric
    becomes one pass."""
    d = t(spark, sf_dir, "documents", spread=True)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(_VOCAB_SIZE)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long")).alias("n_oov"),
            F.round(
                F.sum(F.col("in_vocab").isNull().cast("double")) / F.count("*"), 6
            ).alias("oov_rate"),
        )
    )


_SEG_W = 10  # words per segment

_SEG_DEDUP_ORACLE = f"""
    WITH segs AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               unnest(range(0, CAST(ceil(len(string_split(text, ' ')) / {_SEG_W}.0)
                                AS BIGINT))) AS i
        FROM documents
    ), seg2 AS (
        SELECT doc_id,
               array_to_string(w[i*{_SEG_W}+1 : i*{_SEG_W}+{_SEG_W}], ' ') AS seg
        FROM segs
    ), pres AS (SELECT DISTINCT doc_id, seg FROM seg2),
    cnt AS (SELECT seg, count(*) AS n_docs FROM pres GROUP BY seg)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(count(*) FILTER (c.n_docs >= 2) AS BIGINT) AS n_shared_segments
    FROM seg2 s JOIN cnt c ON s.seg = c.seg
    GROUP BY s.doc_id
"""


@query("text_segment_dedup", oracle=_SEG_DEDUP_ORACLE, tags=("text", "dedup"))
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2s: SEGMENT-level duplication profiling — the sub-document
    complement to the doc-level dedup family. Training-data curation
    removes boilerplate that repeats ACROSS documents (headers,
    licenses, navigation chrome) even when the documents as wholes are
    unique; the standard pass segments each doc into fixed word
    windows and flags segments present in ≥2 distinct documents.
    Segmentation is a JVM-side higher-order expression (transform over
    sequence → slice → concat_ws) exploded in the scan stage — no
    Python, no pre-shuffle materialization (the codegen-cliff lesson).
    Per-doc segment totals come from the same pass. The cross-doc
    count shuffles the DISTINCT (doc, segment) presence pairs on the
    segment key; the count relation joins back on that same key
    (co-partitioned — exchange reuse collapses the diamond), then one
    doc-key aggregate. At 100 TB, group on xxhash64(segment) instead
    of the raw string (8-byte shuffle keys; collisions only merge
    counts, and a 64-bit space keeps the error below any curation
    threshold) — the raw-string form here keeps the DuckDB oracle
    exact. Scale: 3 shuffles, all on segment/doc keys, never on raw
    text bytes except the presence pairs themselves."""
    docs = t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    seg_expr = (
        f"explode(transform(sequence(0, CAST(ceil(size(split(text, ' ')) / {_SEG_W}.0)"
        f" AS INT) - 1), i -> concat_ws(' ', slice(split(text, ' '), i*{_SEG_W}+1,"
        f" {_SEG_W}))))"
    )
    segs = docs.select("doc_id", F.expr(seg_expr).alias("seg"))
    pres = segs.select("doc_id", "seg").distinct()
    cnt = pres.groupBy("seg").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        segs.join(cnt, "seg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias(
                "n_shared_segments"
            ),
        )
    )


_FH_DIM = 16  # hashed feature dimension

_FH_BUCKET_SQL_DUCK = "CAST(('0x' || substr(md5(w), 1, 2)) AS BIGINT) % 16"
_FH_SIGN_SQL_DUCK = (
    "CASE WHEN CAST(('0x' || substr(md5(w), 3, 1)) AS BIGINT) % 2 = 0"
    " THEN 1 ELSE -1 END"
)

_FH_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), feat AS (
        SELECT doc_id, {_FH_BUCKET_SQL_DUCK} AS bucket,
               {_FH_SIGN_SQL_DUCK} AS sign
        FROM words
    )
    SELECT doc_id,
           {", ".join(
               f"CAST(coalesce(sum(CASE WHEN bucket = {i} THEN sign END), 0)"
               f" AS BIGINT) AS f{i}" for i in range(_FH_DIM)
           )}
    FROM feat GROUP BY doc_id
"""


@query("text_feature_hashing", oracle=_FH_ORACLE, tags=("text", "embedding"))
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/D3 bridge: the hashing trick — model-free bag-of-words
    embeddings where feature index = hash(word) mod D and a second
    hash bit supplies the sign (Weinberger et al.; the unbiased
    signed variant). No vocabulary, no training, no shuffle of any
    dictionary: each document's 16-dim signed-count vector folds up
    map-side in ONE doc-key aggregate over the in-scan word explode.
    Both engines derive bucket and sign from the same md5 hex digits
    (the established cross-engine hash: Spark `conv(substring(md5))`
    ≡ DuckDB `CAST('0x'||substr(md5))`), so every one of the 16
    columns is an exact signed BIGINT — the embedding is
    hash-checked, not approximated. At 100 TB this replaces md5 with
    xxhash64 (same plan, cheaper hash) and D grows to 2^18+; columns
    become an array constructed AFTER the aggregate — the per-bucket
    conditional-sum shape is unchanged. Downstream: these vectors
    feed the same cosine/LSH/PQ operators as model embeddings."""
    docs = t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    bucket = F.expr("CAST(conv(substring(md5(w), 1, 2), 16, 10) AS BIGINT) % 16")
    sign = F.expr(
        "CASE WHEN CAST(conv(substring(md5(w), 3, 1), 16, 10) AS BIGINT) % 2 = 0"
        " THEN 1 ELSE -1 END"
    )
    feat = words.select("doc_id", bucket.alias("bucket"), sign.alias("sign"))
    return feat.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bucket") == i, F.col("sign"))), F.lit(0)
            ).alias(f"f{i}")
            for i in range(_FH_DIM)
        ]
    )


# A literal BPE-style merge table, applied in priority order. Each
# rule rewrites a space-separated symbol pair into its merged symbol —
# exactly how a trained BPE vocabulary is applied at tokenization
# time (training itself is the pair-counting loop
# agg_cooccurrence_pairs demonstrates the scale shape of).
_BPE_MERGES = (
    ("t h", "th"),
    ("th e", "the"),
    ("i n", "in"),
    ("a n", "an"),
    ("an d", "and"),
    ("e r", "er"),
    ("o n", "on"),
    ("r e", "re"),
)


def _bpe_oracle() -> str:
    expr = "regexp_replace(lower(substr(text, 1, 32)), '[^a-z]', '', 'g')"
    expr = f"trim(regexp_replace({expr}, '(.)', '\\1 ', 'g'))"
    for pat, rep in _BPE_MERGES:
        expr = f"replace({expr}, '{pat}', '{rep}')"
    return f"""
        WITH enc AS (SELECT doc_id, {expr} AS encoded FROM documents)
        SELECT doc_id,
               CAST(len(string_split(encoded, ' ')) AS INTEGER) AS n_tokens,
               substr(encoded, 1, 48) AS encoded_prefix
        FROM enc WHERE encoded <> ''
    """


@query("text_bpe_apply", oracle=_bpe_oracle(), tags=("text", "tokenize"))
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4t: BPE merge-table APPLICATION at scan speed — the
    tokenization-time half of byte-pair encoding: symbols start as
    characters and a trained, ordered merge list contracts adjacent
    pairs. With the merge table as literals the whole tokenizer is a
    chain of codegen'd ``replace`` calls inside the scan projection —
    zero shuffle, zero Python, the shape a 100 TB tokenize-and-count
    pass wants (a real 50k-merge vocabulary compiles the same way, or
    moves to a broadcast trie in a pandas UDF when the chain exceeds
    codegen limits — the 8-merge chain here stays well inside).
    Normalization (lowercase a-z of the first 32 chars) keeps the
    symbol alphabet closed; the per-doc token count and the encoded
    prefix are both hash-checked, so a merge applied out of ORDER
    (th e→the before t h→th yields different symbols) breaks the
    hash."""
    d = t(spark, sf_dir, "documents", spread=True)
    enc = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.substring("text", 1, 32)), "[^a-z]", ""),
            "(.)",
            "$1 ",
        )
    )
    for pat, rep in _BPE_MERGES:
        enc = F.replace(enc, F.lit(pat), F.lit(rep))
    return (
        d.select("doc_id", enc.alias("encoded"))
        .filter(F.col("encoded") != "")
        .select(
            "doc_id",
            F.size(F.split("encoded", " ")).alias("n_tokens"),
            F.substring("encoded", 1, 48).alias("encoded_prefix"),
        )
    )


# Laplace-smoothed bigram LM under the corpus's own distribution —
# the bigram upgrade of text_unigram_logprob (CCNet/Gopher perplexity
# bucketing). log is NATURAL on both engines (DuckDB's log() is
# log10 — probed; ln() is the twin of Spark's F.log).
_BIGRAM_ORACLE = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    big AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM toks, range(1, 4000) r(i)
        WHERE i + 1 <= len(tk) AND tk[i] <> '' AND tk[i + 1] <> ''
    ),
    c1 AS (SELECT w1, count(*) AS n1 FROM big GROUP BY w1),
    c12 AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY w1, w2),
    v AS (SELECT count(DISTINCT w2) AS vocab FROM big),
    scored AS (
        SELECT b.doc_id,
               CAST(floor(ln((c12.n12 + 1.0) / (c1.n1 + v.vocab))
                          * 1000000 + 0.5) AS BIGINT) AS lp_micro
        FROM big b
        JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
        JOIN c1 ON b.w1 = c1.w1
        CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(lp_micro) AS BIGINT) AS logprob_sum_micro
    FROM scored GROUP BY doc_id
"""


@query("text_bigram_logprob", oracle=_BIGRAM_ORACLE, tags=("text", "quality"))
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5b: bigram language-model log-probability per document —
    the perplexity-style quality signal one step up from
    text_unigram_logprob: P(w2|w1) with Laplace smoothing under the
    corpus's own bigram distribution, so template-y documents score
    high and token-salad scores low. Exactness: each bigram's log-prob
    is quantized to integer micro-units BEFORE the per-doc sum (float
    log-sums are addition-order-dependent; BIGINT sums are not).
    Scale shape: the bigram relation shuffles twice to build the
    count tables (|bigram vocab|-sized aggregates, map-side
    combinable), then the scoring join keys on the bigram — at 100 TB
    a frequency floor on c12 shrinks the model under the broadcast
    threshold and the token stream joins against a broadcast dict,
    same as the unigram path; the vocab scalar broadcasts always."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    big = (
        t(spark, sf_dir, "documents", spread=True)
        .select(
            "doc_id",
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice(toks, 1, n - 1),
                    F.slice(toks, 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            )
            .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            .alias("bs"),
        )
        .select("doc_id", F.explode("bs").alias("b"))
        .select("doc_id", "b.w1", "b.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    big = scoped_persist(big)
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    vocab = big.select(F.countDistinct("w2").alias("vocab"))
    lp_micro = F.floor(
        F.log((F.col("n12") + F.lit(1.0)) / (F.col("n1") + F.col("vocab")))
        * 1_000_000
        + F.lit(0.5)
    ).cast("bigint")
    return (
        big.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp_micro.alias("lp_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").alias("logprob_sum_micro"),
        )
    )


_URLCANON_ORACLE = """
    WITH raw AS (
        SELECT c_custkey,
               'HTTPS://Talkdesk.Example.COM:443' AS originhost,
               '/reports/view' AS path,
               'utm_source=mail&b=' || CAST(c_custkey % 7 AS VARCHAR)
                 || '&a=' || CAST(c_custkey % 3 AS VARCHAR) AS q
        FROM customer
    )
    SELECT c_custkey,
           'https://talkdesk.example.com/reports/view?'
             || array_to_string(
                    list_sort(list_filter(string_split(q, '&'),
                              x -> NOT starts_with(x, 'utm_'))), '&')
               AS canonical_url
    FROM raw
"""


@query("text_url_canonicalize", oracle=_URLCANON_ORACLE, tags=("text", "url", "dedup"))
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2u: URL canonicalization — the standard pre-dedup step of a
    web-crawl pipeline (two crawls of the same page differ only in
    host case, default port, tracking params, param order, fragment).
    Canonical form: lowercase scheme+host, strip the default port,
    drop utm_* tracking params, SORT surviving query params. All
    in-scan string/array HOFs (split → filter → sort → join), zero
    shuffle, zero Python; dedup_exact downstream then collapses crawl
    variants. The messy URL is derived deterministically from the
    customer key (param order deliberately unsorted, tracking param
    present, upper-case host+port) so both engines construct and
    canonicalize the identical input."""
    c = t(spark, sf_dir, "customer", spread=True)
    q = F.concat(
        F.lit("utm_source=mail&b="),
        (F.col("c_custkey") % 7).cast("string"),
        F.lit("&a="),
        (F.col("c_custkey") % 3).cast("string"),
    )
    kept = F.array_sort(
        F.filter(F.split(q, "&"), lambda x: ~x.startswith("utm_"))
    )
    return c.select(
        "c_custkey",
        F.concat(
            F.lit("https://talkdesk.example.com/reports/view?"),
            F.array_join(kept, "&"),
        ).alias("canonical_url"),
    )
