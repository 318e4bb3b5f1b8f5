"""Data-selection operators: the "which documents do we train on" family
a large-scale pretraining pipeline runs AFTER cleaning/dedup —
importance-resampled domain matching (DSIR, Xie et al. 2023,
arXiv:2302.03169), a trained quality classifier (the GPT-3/LLaMA-style
linear filter over hashed token features), and hard blocklist filtering
(C4, Raffel et al. 2020, arXiv:1910.10683 §2.2).

All three share the corpus tokenizer convention of the other doc queries
(split on ' ', drop empties) and the cross-engine token-id convention of
``doc_fingerprints`` (dense_rank over the corpus vocabulary; at 100 TB
substitute ``xxhash64(token) % B`` — same downstream algebra, shuffle-free
id assignment, and the bucket hash only has to be STABLE, not ranked).

Scale shape notes per query in the docstrings; none of the three ever
materializes model state bigger than O(B) rows (B = hash buckets), so the
broadcast joins stay broadcasts at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import QuerySpec, register

#: hashed-feature bucket count: small enough that the per-bucket weight /
#: log-ratio tables broadcast trivially, large enough that the synthetic
#: ~120-word vocabulary rarely collides
_B = 64
#: DSIR / classifier "target domain" predicate column
_TARGET_LANG = "en"

_TOKS_CTE = """
toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
    FROM documents
),
ids AS (
    SELECT tok, CAST(DENSE_RANK() OVER (ORDER BY tok) - 1 AS BIGINT) AS tid
    FROM (SELECT DISTINCT tok FROM toks)
),
tokb AS (
    SELECT t.doc_id, i.tid % {B} AS bucket
    FROM toks t JOIN ids i USING (tok)
)
""".replace(
    "{B}", str(_B)
)


def bench_warmup(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the family's shared payloads (token buckets, classifier
    features + labels) — bench family build line."""
    from .shared import materialized

    _tok_buckets(spark, sf_dir).count()
    materialized(
        spark, sf_dir, "qc_feats", lambda: _doc_feats(spark, sf_dir)
    ).count()


def _tok_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bucket) per token occurrence — hashed unigram features,
    materialized per session (DSIR consumes it twice in one plan, the
    classifier once per training step; one cached build serves all).

    The dense_rank vocabulary id is the cross-engine-stable test-scale
    convention (single-partition window over the DISTINCT vocabulary — a
    dimension-table rank, not a data-scale sort; the 100 TB path swaps in
    xxhash64 % B, which needs no vocabulary pass at all).
    """
    from .shared import materialized

    return materialized(
        spark, sf_dir, "sel_tokb", lambda: _build_tok_buckets(spark, sf_dir)
    )


#: per-(session, sf_dir) doc-count cache for the partition sizing below
_NDOC_CACHE: dict[tuple[str, str], int] = {}


def _doc_parts(spark: SparkSession, sf_dir: str) -> int:
    """Data-derived partition count for the classifier's doc-keyed
    frames: ~1250 docs (≈60k hashed-feature rows) per partition, floor 2.
    Grows linearly with the corpus — a size rule, not a core-count rule
    (the count is a parquet metadata read, cached per session)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    n = _NDOC_CACHE.get(key)
    if n is None:
        n = load_table(spark, sf_dir, "documents").count()
        _NDOC_CACHE[key] = n
    import math

    return max(2, math.ceil(n / 1250))


def _build_tok_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    ids = (
        toks.select("tok")
        .distinct()
        .withColumn(
            "tid",
            (F.dense_rank().over(Window.orderBy("tok")) - 1).cast("bigint"),
        )
    )
    # vocab-id table is dimension-sized by contract — broadcast, so the
    # token stream is bucketed map-side with no shuffle
    return toks.join(F.broadcast(ids), "tok").select(
        "doc_id", (F.col("tid") % _B).alias("bucket")
    )


# ---------------------------------------------------------------------------
# DSIR: hashed-ngram importance weights against a target domain
# ---------------------------------------------------------------------------
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weight vs the target domain.

    Data Selection via Importance Resampling (arXiv:2302.03169): fit two
    bag-of-hashed-unigrams multinomials — p_target over the target-domain
    slice (here ``lang = 'en'``), p_raw over the full corpus — and score
    every document by log w(x) = Σ_tokens (ln p_t[bucket] − ln p_r[bucket])
    with add-one smoothing.  ``target_like`` (log w > 0) is the resampling
    acceptance core; real pipelines sample ∝ w with a Gumbel top-k, which
    reduces to this score plus the deterministic hash-split machinery of
    ``hash_split_sizes``.

    Scale shape: one groupBy bucket over the token stream (map-side
    combine → B rows), the per-bucket log-ratio table broadcast onto the
    token stream, one per-doc aggregation.  No shuffle carries more than
    O(tokens) rows and the model state is B rows.
    """
    tokb = _tok_buckets(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        "doc_id", (F.col("lang") == _TARGET_LANG).alias("is_tgt")
    )
    t = tokb.join(lab, "doc_id")
    per_bucket = t.groupBy("bucket").agg(
        F.count("*").cast("double").alias("cr"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0))
        .cast("double")
        .alias("ct"),
    )
    totals = per_bucket.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    ratios = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1.0) / (F.col("tt") + float(_B)))
            - F.log((F.col("cr") + 1.0) / (F.col("tr") + float(_B)))
        ).alias("lr"),
    )
    return (
        tokb.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lr").alias("log_weight"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "log_weight",
            (F.col("log_weight") > 0.0).alias("target_like"),
        )
    )


register(
    QuerySpec(
        "dsir_importance_weights",
        q_dsir_importance_weights,
        f"""
        WITH {_TOKS_CTE},
        lab AS (SELECT doc_id, lang = '{_TARGET_LANG}' AS is_tgt
                FROM documents),
        per_bucket AS (
            SELECT b.bucket,
                   CAST(COUNT(*) AS DOUBLE) AS cr,
                   CAST(SUM(CASE WHEN l.is_tgt THEN 1 ELSE 0 END) AS DOUBLE)
                       AS ct
            FROM tokb b JOIN lab l USING (doc_id)
            GROUP BY 1
        ),
        totals AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM per_bucket),
        ratios AS (
            SELECT bucket,
                   ln((ct + 1.0) / (tt + {float(_B)}))
                   - ln((cr + 1.0) / (tr + {float(_B)})) AS lr
            FROM per_bucket CROSS JOIN totals
        )
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               SUM(r.lr) AS log_weight,
               SUM(r.lr) > 0.0 AS target_like
        FROM tokb b JOIN ratios r USING (bucket)
        GROUP BY 1
        """,
        doc="DSIR hashed-unigram importance log-weights vs target domain "
        "(arXiv:2302.03169)",
    )
)


# ---------------------------------------------------------------------------
# trained quality classifier: hashed logistic regression, fully declarative
# ---------------------------------------------------------------------------
_T_ITERS = 6
_LR = 4.0
_BIAS = -1  # pseudo-bucket carrying the intercept (x = 1.0 for every doc)


def quality_classifier_scores(
    docs_feats: DataFrame,
    labels: DataFrame,
    n_iters: int = _T_ITERS,
    lr: float = _LR,
) -> DataFrame:
    """Train a hashed-bag-of-words logistic regression by full-batch
    gradient descent and return per-doc scores — the GPT-3/LLaMA-style
    learned quality filter (high-quality reference corpus = positive
    class), as ONE declarative DataFrame program.

    `docs_feats`: (doc_id, bucket, x) tf features incl. the bias
    pseudo-bucket; `labels`: (doc_id, y∈{0.0,1.0}).

    The training loop runs as T chained DataFrame steps: each iteration
    is score (Σ x·w per doc) → residual (σ(z) − y) → gradient
    (Σ r·x / N per bucket) → weight update, where the weight and
    gradient tables are O(B) rows and every weight join is a broadcast.
    No .collect() — the model NEVER leaves the executors; each updated
    weight table is `localCheckpoint`ed (O(B) rows) so the next
    iteration's plan starts from materialized blocks instead of
    re-analyzing/re-executing the whole prefix (an unrolled-lineage
    variant measured 10 s of driver-side plan analysis at T=6).  The
    same unrolled algebra is emitted as the SQL oracle, so the entire
    FIT (not just the scoring pass) is certified cross-engine.
    Scale: 2 shuffles per iteration over the (doc, bucket) aggregate
    (O(docs·B) rows max), model state B+1 rows; callers persist
    `docs_feats` once and the T passes re-read the cached aggregate.
    """
    # N is the one number that leaves the cluster: a scalar aggregate
    # (same class as the kernel sizing counts), NOT model state
    n = float(labels.count())
    wt = (
        docs_feats.select("bucket")
        .distinct()
        .withColumn("w", F.lit(0.0))
        .localCheckpoint()
    )
    for _ in range(n_iters):
        z = (
            docs_feats.join(F.broadcast(wt), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
        )
        resid = z.join(labels, "doc_id").select(
            "doc_id",
            (1.0 / (1.0 + F.exp(-F.col("z"))) - F.col("y")).alias("r"),
        )
        grad = (
            docs_feats.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("r") * F.col("x") / F.lit(n)).alias("g"))
        )
        wt = (
            wt.join(grad, "bucket", "left")
            .select(
                "bucket",
                (F.col("w") - lr * F.coalesce("g", F.lit(0.0))).alias("w"),
            )
            .localCheckpoint()
        )
    scores = (
        docs_feats.join(F.broadcast(wt), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
        .join(labels, "doc_id")
        .select(
            "doc_id",
            F.col("y").cast("int").alias("label"),
            (1.0 / (1.0 + F.exp(-F.col("z")))).alias("score"),
        )
    )
    return scores.withColumn("predicted", F.col("score") > 0.5)


def _doc_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bucket, x): per-doc tf over hashed unigrams + bias row."""
    tokb = _tok_buckets(spark, sf_dir)
    cnts = tokb.groupBy("doc_id", "bucket").agg(
        F.count("*").cast("double").alias("c")
    )
    # doc lengths from the ALREADY-aggregated counts (≤B rows per doc),
    # not a second pass over the token stream
    nd = cnts.groupBy("doc_id").agg(F.sum("c").alias("nd"))
    tf = cnts.join(nd, "doc_id").select(
        "doc_id", "bucket", (F.col("c") / F.col("nd")).alias("x")
    )
    bias = nd.select(
        "doc_id", F.lit(_BIAS).cast("bigint").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    # pre-partition on doc_id: the persisted copy's hash partitioning is
    # reused by every iteration's per-doc groupBy and residual join, so
    # each training step only shuffles the O(B)-row gradient table.
    # Partition COUNT is derived from the corpus size (~60k feature rows
    # per partition), not the session shuffle default: the fit runs T
    # chained jobs over this frame, and 64 scheduling-bound tasks per
    # stage dominated the runtime at test scale (r16 A/B: 4.9 s at the
    # 64-partition default vs 2.9 s data-sized; guide §2.2 — partitions
    # sized by bytes, count grows linearly with the corpus).
    return tf.unionByName(bias).repartition(
        _doc_parts(spark, sf_dir), "doc_id"
    )


def q_quality_classifier_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-classifier scores over the documents table (target class =
    ``lang = 'en'`` as the stand-in reference corpus; on this synthetic
    word-soup the class signal is weak by construction — the certified
    surface is the distributed training algebra, and
    tests/test_selectionops.py proves real learning on a separable
    fixture)."""
    from .shared import materialized

    feats = materialized(
        spark, sf_dir, "qc_feats", lambda: _doc_feats(spark, sf_dir)
    )
    labels = materialized(
        spark,
        sf_dir,
        "qc_labels",
        lambda: load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(F.col("lang") == _TARGET_LANG, 1.0)
            .otherwise(0.0)
            .alias("y"),
        )
        .join(feats.select("doc_id").distinct(), "doc_id")
        .repartition(_doc_parts(spark, sf_dir), "doc_id"),
    )
    return quality_classifier_scores(feats, labels)


def _classifier_oracle() -> str:
    feats = f"""
        WITH {_TOKS_CTE},
        cnts AS (
            SELECT doc_id, bucket, CAST(COUNT(*) AS DOUBLE) AS c
            FROM tokb GROUP BY 1, 2
        ),
        nd AS (
            SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS nd
            FROM tokb GROUP BY 1
        ),
        feats AS (
            SELECT c.doc_id, c.bucket, c.c / n.nd AS x
            FROM cnts c JOIN nd n USING (doc_id)
            UNION ALL
            SELECT doc_id, CAST({_BIAS} AS BIGINT) AS bucket, 1.0 AS x
            FROM nd
        ),
        lab AS (
            SELECT d.doc_id,
                   CASE WHEN d.lang = '{_TARGET_LANG}' THEN 1.0
                        ELSE 0.0 END AS y
            FROM documents d JOIN nd ON d.doc_id = nd.doc_id
        ),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lab),
        w0 AS (SELECT DISTINCT bucket, 0.0 AS w FROM feats)"""
    steps = []
    for i in range(_T_ITERS):
        steps.append(
            f"""
        z{i} AS (
            SELECT f.doc_id, SUM(f.x * w.w) AS z
            FROM feats f JOIN w{i} w USING (bucket) GROUP BY 1
        ),
        r{i} AS (
            SELECT z.doc_id, 1.0 / (1.0 + exp(-z.z)) - l.y AS r
            FROM z{i} z JOIN lab l USING (doc_id)
        ),
        g{i} AS (
            SELECT f.bucket, SUM(r.r * f.x / nn.n) AS g
            FROM feats f JOIN r{i} r USING (doc_id) CROSS JOIN nn
            GROUP BY 1
        ),
        w{i + 1} AS (
            SELECT w.bucket, w.w - {_LR} * COALESCE(g.g, 0.0) AS w
            FROM w{i} w LEFT JOIN g{i} g USING (bucket)
        )"""
        )
    final = f"""
        SELECT f.doc_id,
               CAST(l.y AS INT) AS label,
               1.0 / (1.0 + exp(-SUM(f.x * w.w))) AS score,
               1.0 / (1.0 + exp(-SUM(f.x * w.w))) > 0.5 AS predicted
        FROM feats f
        JOIN w{_T_ITERS} w USING (bucket)
        JOIN lab l USING (doc_id)
        GROUP BY f.doc_id, l.y"""
    return feats + "," + ",".join(steps) + final


register(
    QuerySpec(
        "quality_classifier_scores",
        q_quality_classifier_scores,
        _classifier_oracle(),
        doc="hashed-BoW logistic-regression quality filter, full-batch GD "
        f"unrolled {_T_ITERS} steps into the plan — the TRAINING loop is "
        "oracle-certified, not just scoring (GPT-3-style learned data "
        "filter; arXiv:2005.14165 App. A)",
    )
)


# ---------------------------------------------------------------------------
# C4-style blocklist filtering
# ---------------------------------------------------------------------------
#: word blocklist (C4 drops any page containing a listed word verbatim —
#: arXiv:1910.10683 §2.2; the list itself is corpus-specific)
_BLOCKLIST = ("slow", "null", "merge")


def q_blocklist_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source blocklist hit stats: docs flagged (any blocklisted TOKEN
    present — word-boundary exact, not substring), hit occurrences, and
    surviving-corpus size — the C4 hard-filter pass as one aggregation.

    Stateless map over the token array (codegen `arrays_overlap` /
    `array_intersect`, no UDF) + one partial-agg rollup on the
    low-cardinality source key: embarrassingly parallel at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    bl = F.array(*[F.lit(w) for w in _BLOCKLIST])
    per_doc = docs.select(
        "source",
        toks.alias("toks"),
        F.arrays_overlap(toks, bl).alias("flagged"),
        F.size(F.filter(toks, lambda t: t.isin(*_BLOCKLIST)))
        .cast("bigint")
        .alias("n_hits"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("flagged"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum("n_hits").cast("bigint").alias("n_hits"),
        F.sum(F.when(~F.col("flagged"), F.size("toks")).otherwise(0))
        .cast("bigint")
        .alias("surviving_tokens"),
    )


register(
    QuerySpec(
        "blocklist_filter_stats",
        q_blocklist_filter_stats,
        f"""
        WITH per_doc AS (
            SELECT source,
                   list_filter(string_split(text, ' '), t -> t <> '')
                       AS toks
            FROM documents
        ),
        scored AS (
            SELECT source,
                   len(toks) AS n_toks,
                   len(list_filter(toks,
                       t -> list_contains({list(_BLOCKLIST)!r}, t)))
                       AS n_hits
            FROM per_doc
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged,
               CAST(SUM(n_hits) AS BIGINT) AS n_hits,
               CAST(SUM(CASE WHEN n_hits = 0 THEN n_toks ELSE 0 END)
                    AS BIGINT) AS surviving_tokens
        FROM scored GROUP BY 1
        """,
        doc="C4-style blocklist hard filter, per-source rollup "
        "(arXiv:1910.10683 §2.2)",
    )
)


# ---------------------------------------------------------------------------
# batch drift monitoring: PSI between ingest batches
# ---------------------------------------------------------------------------
def q_batch_drift_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index contributions per hashed token bucket
    between the EXISTING corpus and the INCOMING ingest batch (same
    hash-bucket split as ``incremental_dedup_flags``) — the
    distribution-shift monitor a production pipeline runs on every batch
    before letting it into the training mix.

    psi_b = (p_a[b] − p_b[b]) · ln(p_a[b] / p_b[b]) with add-one
    smoothing; Σ_b psi_b < 0.1 is the conventional "no shift" band.
    Scale shape: the token stream collapses to B rows in ONE partial-agg
    groupBy (two conditional sums, no second pass); everything after is
    arithmetic on a B-row table.
    """
    from .pipelineops import _HASH_A, _HASH_MOD, _TRAIN_LT

    tokb = _tok_buckets(spark, sf_dir)
    in_a = (F.col("doc_id") * _HASH_A) % _HASH_MOD < _TRAIN_LT
    per_bucket = tokb.groupBy("bucket").agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("double").alias("ca"),
        F.sum(F.when(~in_a, 1).otherwise(0)).cast("double").alias("cb"),
    )
    totals = per_bucket.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    pa = (F.col("ca") + 1.0) / (F.col("ta") + float(_B))
    pb = (F.col("cb") + 1.0) / (F.col("tb") + float(_B))
    return per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.col("ca").cast("bigint").alias("n_existing"),
        F.col("cb").cast("bigint").alias("n_incoming"),
        ((pa - pb) * F.log(pa / pb)).alias("psi"),
    )


def _drift_oracle() -> str:
    from .pipelineops import _HASH_A, _HASH_MOD, _TRAIN_LT

    pred = f"(doc_id * {_HASH_A}) % {_HASH_MOD} < {_TRAIN_LT}"
    return f"""
        WITH {_TOKS_CTE},
        ab AS (
            SELECT bucket,
                   CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS DOUBLE)
                       AS ca,
                   CAST(SUM(CASE WHEN {pred} THEN 0 ELSE 1 END) AS DOUBLE)
                       AS cb
            FROM tokb GROUP BY 1
        ),
        tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM ab)
        SELECT bucket,
               CAST(ca AS BIGINT) AS n_existing,
               CAST(cb AS BIGINT) AS n_incoming,
               ((ca + 1.0) / (ta + {float(_B)})
                - (cb + 1.0) / (tb + {float(_B)}))
               * ln(((ca + 1.0) / (ta + {float(_B)}))
                    / ((cb + 1.0) / (tb + {float(_B)}))) AS psi
        FROM ab CROSS JOIN tot
        """


register(
    QuerySpec(
        "batch_drift_stats",
        q_batch_drift_stats,
        _drift_oracle(),
        doc="PSI distribution-shift monitor between the existing corpus "
        "and the incoming ingest batch (hashed token buckets, add-one "
        "smoothing; one partial-agg groupBy then B-row arithmetic)",
    )
)


# ---------------------------------------------------------------------------
# multilingual temperature sampling (mT5 alpha-sampling)
# ---------------------------------------------------------------------------
_ALPHA = 0.3  # mT5's exponent (arXiv:2010.11934 §3.1)
_EPOCH_TOKENS = 100_000


def q_lang_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language temperature-adjusted sampling rates: p_l ∝ (share)^α
    with α = 0.3 — the mT5/XLM-R recipe that up-samples low-resource
    languages without drowning the head (arXiv:2010.11934 §3.1), plus
    the resulting token allocation at a fixed epoch budget.

    Scale shape: ONE partial-agg groupBy on the low-cardinality lang key
    collapses the corpus; everything after is arithmetic on a
    languages-count-sized table (two broadcast scalar joins).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ).cast("bigint")
    per_lang = docs.select("lang", n_toks.alias("nt")).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
    )
    tot = per_lang.agg(F.sum("n_tokens").cast("double").alias("t"))
    raw = per_lang.crossJoin(F.broadcast(tot)).withColumn(
        "p_raw", F.col("n_tokens") / F.col("t")
    ).withColumn("w", F.pow("p_raw", F.lit(_ALPHA)))
    z = raw.agg(F.sum("w").alias("z"))
    # the exact-compared BIGINT allocation must come from a pre-rounded
    # rate: pow() and the order-dependent z sum differ in the last ulp
    # across engines, and a value sitting ON an x.5 boundary would round
    # apart (repo rule: round before any discrete decision)
    return raw.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        "n_tokens",
        "p_raw",
        (F.col("w") / F.col("z")).alias("p_sampling"),
        F.round(F.round(F.col("w") / F.col("z"), 9) * _EPOCH_TOKENS)
        .cast("bigint")
        .alias("tokens_at_budget"),
    )


register(
    QuerySpec(
        "lang_temperature_sampling",
        q_lang_temperature_sampling,
        f"""
        WITH per_lang AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(list_filter(string_split(text, ' '),
                                            t -> t <> ''))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM per_lang),
        raw AS (
            SELECT lang, n_docs, n_tokens,
                   n_tokens / t AS p_raw,
                   pow(n_tokens / t, {_ALPHA}) AS w
            FROM per_lang CROSS JOIN tot
        ),
        z AS (SELECT SUM(w) AS z FROM raw)
        SELECT lang, n_docs, n_tokens, p_raw,
               w / z AS p_sampling,
               CAST(round(round(w / z, 9) * {_EPOCH_TOKENS}) AS BIGINT)
                   AS tokens_at_budget
        FROM raw CROSS JOIN z
        """,
        doc="mT5-style temperature sampling rates per language "
        "(arXiv:2010.11934 §3.1, alpha=0.3) + epoch token allocation",
    )
)
