"""Round-15 wave 15c: the ANN operating curve and three embedding-
geometry quality readouts.

* ``similarity_ivfpq_tradeoff`` — the IVF-PQ recall/latency OPERATING
  CURVE (the r13 VERDICT candidate): the full probe→ADC→re-rank
  pipeline swept over nprobe in {1, 2, 4, 8}, each point emitting
  recall@10 vs the exact top-k AND the scanned-candidate fraction —
  the two axes of every production ANN tuning decision, as one
  oracled row set. Composed from the SAME parameterized text/pipeline
  as similarity_ivfpq_topk (``_ivfpq_sql`` / ``_ivfpq_topk_df``), so
  the curve and the registered operating point can never drift.
* ``embedding_hubness`` — k-occurrence hubness (Radovanovic JMLR
  2010): how often each vector appears in OTHER vectors' directed
  top-4 neighbor lists, over the shared cosine candidate set (the
  pair memo). High skewness = a few "hub" vectors dominate every
  neighbor list — the known high-dimensional failure mode that
  silently degrades every kNN/ANN row; antihubs (never a neighbor)
  counted beside it.
* ``cluster_silhouette_labels`` — simplified (centroid-based)
  silhouette of the corpus's OWN label partition: a = cosine distance
  to the own-label centroid, b = min distance to any other centroid,
  s = (b-a)/max(a,b). The METRIC-SPACE twin of graph_modularity
  (modularity asks "does the similarity GRAPH agree with the
  labels?"; silhouette asks the same of raw embedding space) —
  linear n x k centroid distances, never the O(n^2) full silhouette.
* ``embedding_anisotropy`` — Ethayarajh 2019 anisotropy: the expected
  pairwise cosine of unit-normalized embeddings via the EXACT
  identity E[cos] = (||sum u||^2 - n) / (n(n-1)) — one pass, no pair
  join at any scale. Anisotropic collections (all vectors sharing a
  dominant direction) make raw cosine similarity uninformative; this
  is the one-number screen for that failure.

House discipline: unit components / cosines / per-row scores quantize
(e9 / e6) BEFORE any cross-row reduction, so every aggregate is an
exact integer sum; component sums stay inside int64 through ~9e9
vectors (documented bound); zero-norm vectors and single-label /
zero-variance corpora flag degenerate, never divide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.registry import register

_TRADEOFF_NPROBES = (1, 2, 4, 8)
_HUB_K = 4
_HUB_FLOOR = 0.25


# ---------------------------------------------------------------------------
# IVF-PQ recall / scan-fraction trade-off
# ---------------------------------------------------------------------------
def _tradeoff_oracle() -> str:
    from emr_with_custom_metrics_spark.llm.similarity import (
        _SQL_TOPK_EXACT,
        _ivfpq_head,
        _ivfpq_sql,
        QUERY_VEC_ID,
        TOP_K,
    )

    arms = []
    for np_ in _TRADEOFF_NPROBES:
        arms.append(f"""
    SELECT CAST({np_} AS BIGINT) AS nprobe,
           s.n_scanned,
           CAST(ROUND(s.n_scanned * 1000000.0e0 / t.n_other) AS BIGINT)
               AS scanned_frac_e6,
           h.n_hits,
           CAST(ROUND(h.n_hits * 10000.0e0 / {TOP_K}) AS BIGINT)
               AS recall_e4
    FROM (
        {_ivfpq_head(np_)}
        sc AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_scanned
          FROM embeddings e
          WHERE e.label IN (SELECT label FROM best)
            AND e.vec_id <> {QUERY_VEC_ID})
        SELECT n_scanned FROM sc
    ) s
    CROSS JOIN (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM ({_ivfpq_sql(np_)}) tt
        WHERE tt.vec_id IN
              (SELECT vec_id FROM ({_SQL_TOPK_EXACT}) xx)
    ) h
    CROSS JOIN (
        SELECT CAST(COUNT(*) - 1 AS BIGINT) AS n_other FROM embeddings
    ) t""")
    return " UNION ALL ".join(arms) + "\n    ORDER BY nprobe"


_ANN_INDEX_CACHE: dict[tuple[str, str], tuple] = {}


def _staged_ann_index(spark: SparkSession, sf_dir: str) -> tuple:
    """The IVF-PQ INDEX as a session-staged relation set (the welch-pv
    staging policy, plans/stage_memo): exact top-k ids, quantized
    centroids, codebooks, corpus-wide PQ codes + labels, the query ADC
    table, and per-vector exact query cosines — all pure deterministic
    functions of sf_dir, built eagerly at most once per (session,
    sf_dir). At 100 TB this is the STORED index (codes are computed at
    index time, not per query); here it also keeps the sweep's bench
    cost index-build-once instead of four pipelines deep."""
    from emr_with_custom_metrics_spark.catalog import load_fanned
    from emr_with_custom_metrics_spark.functions.vector import cosine
    from emr_with_custom_metrics_spark.llm.similarity import (
        _l2sq,
        _sub_slices,
        label_centroids,
        pq_codebooks,
        similarity_topk_exact,
        QUERY_VEC_ID,
    )
    from emr_with_custom_metrics_spark.plans import stage_memo

    stage_memo.note_rider()
    key = (spark.sparkContext.applicationId, sf_dir)
    stale = [k for k in _ANN_INDEX_CACHE if k[0] != key[0]]
    for k in stale:
        del _ANN_INDEX_CACHE[k]
    hit = _ANN_INDEX_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.0
    with stage_memo.timed_build("ann_index", sf):
        e = load_fanned(spark, sf_dir, "embeddings")
        q = e.where(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("embedding").alias("qv")
        )
        exact_ids = similarity_topk_exact(spark, sf_dir).select(
            "vec_id"
        ).localCheckpoint(eager=True)
        n_other_val = e.count() - 1
        # Opt r16: centroids and codebooks derive from ONE shared
        # component-average pass (llm.similarity.pos_avgs) — identical
        # deterministic values, one posexplode instead of two (guide §2.4).
        from emr_with_custom_metrics_spark.llm.similarity import pos_avgs

        avgs = pos_avgs(e).localCheckpoint(eager=False)
        cents = label_centroids(e, avgs).localCheckpoint(eager=True)
        cb = pq_codebooks(e, avgs).localCheckpoint(eager=True)
        vec_slices = _sub_slices(
            e.where(F.col("vec_id") != QUERY_VEC_ID).select(
                "vec_id", "embedding"
            ),
            "embedding",
        )
        codes = (
            vec_slices.join(F.broadcast(cb), "m")
            .select(
                "vec_id",
                "m",
                F.struct(
                    _l2sq(F.col("sub"), F.col("cv")).alias("d2"),
                    F.col("label").alias("cl"),
                ).alias("dc"),
            )
            .groupBy("vec_id", "m")
            .agg(F.min("dc").alias("bestc"))
            .select("vec_id", "m", F.col("bestc.cl").alias("cl"))
            .join(
                e.select("vec_id", F.col("label").alias("vlabel")),
                "vec_id",
            )
            .localCheckpoint(eager=True)
        )
        adc = (
            _sub_slices(q, "qv")
            .join(F.broadcast(cb), "m")
            .select(
                "m",
                F.col("label").alias("cl"),
                _l2sq(F.col("sub"), F.col("cv")).alias("d2"),
            )
            .localCheckpoint(eager=True)
        )
        qcos = e.where(F.col("vec_id") != QUERY_VEC_ID).crossJoin(
            F.broadcast(q)
        ).select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qv")) * 1000000)
            .cast("bigint")
            .alias("cos_sim_e6"),
        ).localCheckpoint(eager=True)
        hit = (exact_ids, n_other_val, cents, cb, codes, adc, qcos, q)
    _ANN_INDEX_CACHE[key] = hit
    return hit



@register(
    "similarity_ivfpq_tradeoff",
    oracle=_tradeoff_oracle(),
    doc="The IVF-PQ recall/latency OPERATING CURVE: the full "
    "probe->ADC->re-rank pipeline swept over nprobe in {1,2,4,8}, "
    "each point emitting recall@10 vs the exact top-k AND the "
    "scanned-candidate fraction (the latency proxy a production "
    "tuner trades against recall). Composed from the SAME "
    "parameterized text and DataFrame pipeline as "
    "similarity_ivfpq_topk (_ivfpq_sql / _ivfpq_topk_df — the slice "
    "discipline), so curve and operating point cannot drift; "
    "similarity_recall_report measures the chosen point, this row "
    "measures the whole dial. Everything deterministic (per-label "
    "centroids/codebooks, e6 cosines, id tie-breaks), so all four "
    "sweep points hash against SQL end-to-end.",
)
def similarity_ivfpq_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Spark side hoists the INDEX BUILD out of the sweep — the real
    # production shape: PQ codes are computed once at index time, and
    # nprobe only changes which cells are SCANNED. Encoding a vector is
    # independent of which cells are probed, so encode-once + filter
    # per arm is result-identical to the oracle's per-arm replay
    # (which re-derives the encode inside each swept text verbatim).
    from emr_with_custom_metrics_spark.llm.similarity import (
        IVFPQ_CANDIDATES,
        TOP_K,
    )
    from emr_with_custom_metrics_spark.functions.vector import cosine

    (exact_ids, n_other_val, cents, cb, codes, adc, qcos, q) = (
        _staged_ann_index(spark, sf_dir)
    )

    arms = []
    for np_ in _TRADEOFF_NPROBES:
        best = (
            cents.crossJoin(F.broadcast(q))
            .select(
                "label", cosine(F.col("centroid"), F.col("qv")).alias("c")
            )
            .orderBy(F.col("c").desc(), F.col("label"))
            .limit(np_)
            .select("label")
        )
        cell_codes = codes.join(
            F.broadcast(best.withColumnRenamed("label", "vlabel")),
            "vlabel",
        )
        scanned = cell_codes.select("vec_id").distinct().agg(
            F.count("*").cast("bigint").alias("n_scanned")
        )
        pool = (
            cell_codes.join(F.broadcast(adc), ["m", "cl"])
            .groupBy("vec_id")
            .agg(
                (
                    F.round(F.sum("d2") * 1000000).cast("bigint")
                    / 1000000.0
                ).alias("pq_dist")
            )
            .orderBy("pq_dist", "vec_id")
            .limit(IVFPQ_CANDIDATES)
            .select("vec_id")
        )
        hits = (
            qcos.join(F.broadcast(pool), "vec_id")
            .orderBy(F.col("cos_sim_e6").desc(), F.col("vec_id"))
            .limit(TOP_K)
            .select("vec_id")
            .join(exact_ids, "vec_id", "left_semi")
            .agg(F.count("*").cast("bigint").alias("n_hits"))
        )
        arms.append(
            scanned.crossJoin(hits).select(
                F.lit(np_).cast("bigint").alias("nprobe"),
                "n_scanned",
                F.round(
                    F.col("n_scanned") * 1000000.0 / F.lit(n_other_val)
                ).cast("bigint").alias("scanned_frac_e6"),
                "n_hits",
                F.round(F.col("n_hits") * 10000.0 / TOP_K)
                .cast("bigint")
                .alias("recall_e4"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("nprobe")


# ---------------------------------------------------------------------------
# Hubness
# ---------------------------------------------------------------------------
_HUB_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cand AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             CAST(ROUND((list_cosine_similarity(a.v, b.v)) * 1000000)
              AS BIGINT) AS c_e6
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE (CAST(ROUND((list_cosine_similarity(a.v, b.v)) * 1000000)
             AS BIGINT) / CAST(1000000 AS DOUBLE)) >= {_HUB_FLOOR}
    ), both_ AS (
      SELECT a_id AS node, b_id AS nbr, c_e6 FROM cand
      UNION ALL SELECT b_id, a_id, c_e6 FROM cand
    ), topk AS (
      -- each node's DIRECTED top-{_HUB_K} neighbor list (hubness needs
      -- direction: the mutual graph symmetrizes it away)
      SELECT node, nbr FROM (
        SELECT node, nbr,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c_e6 DESC, nbr ASC) AS rk
        FROM both_) z
      WHERE rk <= {_HUB_K}
    ), occ AS (
      SELECT nbr, CAST(COUNT(*) AS BIGINT) AS k FROM topk GROUP BY nbr
    ), dense AS (
      -- every vector gets a k-occurrence, zeros included (antihubs
      -- are the point, they must not vanish)
      SELECT emb.vec_id, CAST(COALESCE(o.k, 0) AS BIGINT) AS k
      FROM embeddings emb LEFT JOIN occ o ON o.nbr = emb.vec_id
    ), mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(k) AS BIGINT) AS s1,
             -- second/third moments in DECIMAL (r14 ADVICE): a hub's
             -- k^3 passes 2^53 (and int64) long before the op's
             -- claimed corpus ceiling, where a DOUBLE sum turns
             -- summation-order-dependent. DECIMAL(19,0) * BIGINT *
             -- BIGINT widens to DECIMAL(38,0) in both engines —
             -- exact, order-free; ONE double conversion each.
             CAST(SUM(CAST(k AS DECIMAL(19,0)) * k) AS DOUBLE) AS s2,
             CAST(SUM(CAST(k AS DECIMAL(19,0)) * k * k)
                  AS DOUBLE) AS s3,
             CAST(MAX(k) AS BIGINT) AS max_occ,
             CAST(COUNT(CASE WHEN k = 0 THEN 1 END) AS BIGINT)
                 AS n_antihubs
      FROM dense
    )
    SELECT n AS n_vectors,
           CAST(ROUND(CAST(s1 AS DOUBLE) / n * 1000000) AS BIGINT)
               AS mean_occ_e6,
           CASE WHEN (s2 - CAST(s1 AS DOUBLE) * s1 / n) > 0
                THEN CAST(ROUND(
                     ((s3 - 3.0e0 * s1 / n * s2
                       + 2.0e0 * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n) * s1) / n)
                     / pow((s2 - CAST(s1 AS DOUBLE) * s1 / n) / n,
                           1.5e0)
                     * 1000000) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS skewness_e6,
           max_occ, n_antihubs,
           (s2 - CAST(s1 AS DOUBLE) * s1 / n) <= 0 AS degenerate
    FROM mom
"""


@register(
    "embedding_hubness",
    oracle=_HUB_ORACLE,
    doc="k-occurrence hubness screen (Radovanovic JMLR 2010) over the "
    "shared cosine candidate set (floor 0.25, the pair memo): N_k(v) "
    "= how often v appears in OTHER vectors' directed top-4 neighbor "
    "lists; the row emits the mean, the SKEWNESS of N_k (the hubness "
    "statistic — high skew means a few hub vectors dominate every "
    "neighbor list, the high-dimensional failure mode that silently "
    "degrades every kNN/ANN/dedup row), the max, and the antihub "
    "count (never anyone's neighbor; zeros enter via LEFT JOIN, "
    "never vanish). Second/third moments accumulate in DOUBLE (the "
    "Cochran class); skewness from the raw-moment identity with a "
    "zero-variance guard. Candidate generation is the memoized "
    "bounded relation — never all-pairs.",
)
def embedding_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from emr_with_custom_metrics_spark.catalog import load_fanned
    from emr_with_custom_metrics_spark.llm.dedup import embedding_cosine_pairs

    cand = embedding_cosine_pairs(spark, sf_dir, threshold=_HUB_FLOOR).select(
        "a_id", "b_id",
        F.round(F.col("cos_sim") * 1_000_000).cast("bigint").alias("c_e6"),
    )
    both = cand.select(
        F.col("a_id").alias("node"), F.col("b_id").alias("nbr"), "c_e6"
    ).unionByName(
        cand.select(
            F.col("b_id").alias("node"), F.col("a_id").alias("nbr"), "c_e6"
        )
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c_e6").desc(), F.col("nbr").asc()
    )
    occ = (
        both.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _HUB_K)
        .groupBy("nbr")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    emb = load_fanned(spark, sf_dir, "embeddings").select("vec_id")
    dense = emb.join(occ, emb["vec_id"] == occ["nbr"], "left").select(
        F.coalesce(F.col("k"), F.lit(0)).cast("bigint").alias("k")
    )
    mom = dense.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("s1"),
        # exact order-free DECIMAL moment sums, one double conversion
        # (r14 ADVICE) — mirrors the oracle text above
        F.sum(F.col("k").cast("decimal(19,0)") * F.col("k"))
        .cast("double")
        .alias("s2"),
        F.sum(
            F.col("k").cast("decimal(19,0)") * F.col("k") * F.col("k")
        )
        .cast("double")
        .alias("s3"),
        F.max("k").cast("bigint").alias("max_occ"),
        F.count(F.when(F.col("k") == 0, 1)).cast("bigint").alias(
            "n_antihubs"
        ),
    )
    m2 = F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    m3 = (
        F.col("s3")
        - 3.0 * F.col("s1") / F.col("n") * F.col("s2")
        + 2.0
        * (F.col("s1").cast("double") / F.col("n"))
        * (F.col("s1").cast("double") / F.col("n"))
        * F.col("s1")
    )
    return mom.select(
        F.col("n").alias("n_vectors"),
        F.round(F.col("s1").cast("double") / F.col("n") * 1000000)
        .cast("bigint")
        .alias("mean_occ_e6"),
        F.when(
            m2 > 0,
            F.round(
                (m3 / F.col("n"))
                / F.pow(m2 / F.col("n"), F.lit(1.5))
                * 1000000
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("skewness_e6"),
        "max_occ",
        "n_antihubs",
        (m2 <= 0).alias("degenerate"),
    )


# ---------------------------------------------------------------------------
# Simplified silhouette of the label partition
# ---------------------------------------------------------------------------
_SIL_ORACLE = """
    WITH cent_comp AS (
        -- centroid components quantized e9 so both engines feed the
        -- cosine identical doubles (AVG last-ulp noise never reaches
        -- the a-vs-b comparison); positions length-driven, never a
        -- hardcoded dimension (the wave-15 fixture lesson)
        SELECT label, t.i AS i,
               ROUND(AVG(e0.embedding[t.i]::DOUBLE) * 1000000000)
                   / 1000000000.0e0 AS c
        FROM embeddings e0
        CROSS JOIN UNNEST(range(1, len(e0.embedding) + 1)) AS t(i)
        GROUP BY label, t.i
    ), cent AS (
        SELECT label, LIST(c ORDER BY i) AS centroid
        FROM cent_comp GROUP BY label
    ), dist AS (
        SELECT e.vec_id, e.label AS own, c.label AS cl,
               1000000 - CAST(ROUND(list_cosine_similarity(
                   e.embedding::DOUBLE[], c.centroid) * 1000000)
                   AS BIGINT) AS d_e6
        FROM embeddings e CROSS JOIN cent c
    ), ab AS (
        SELECT vec_id, own,
               CAST(MAX(CASE WHEN cl = own THEN d_e6 END) AS BIGINT)
                   AS a_e6,
               CAST(MIN(CASE WHEN cl <> own THEN d_e6 END) AS BIGINT)
                   AS b_e6
        FROM dist GROUP BY vec_id, own
    ), s AS (
        SELECT vec_id, own,
               CASE WHEN b_e6 IS NULL THEN NULL
                    WHEN GREATEST(a_e6, b_e6) <= 0
                         THEN CAST(0 AS BIGINT)
                    ELSE CAST(ROUND(
                         (CAST(b_e6 AS DOUBLE) - a_e6)
                         / GREATEST(a_e6, b_e6) * 1000000) AS BIGINT)
                    END AS s_e6
        FROM ab
    )
    SELECT own AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(CASE WHEN COUNT(s_e6) > 0
                THEN CAST(ROUND(CAST(SUM(s_e6) AS DOUBLE)
                     / COUNT(s_e6)) AS BIGINT)
                ELSE NULL END AS BIGINT) AS mean_sil_e6,
           CAST(COUNT(CASE WHEN s_e6 < 0 THEN 1 END) AS BIGINT)
               AS n_negative,
           COUNT(s_e6) = 0 AS degenerate
    FROM s GROUP BY own
"""


@register(
    "cluster_silhouette_labels",
    oracle=_SIL_ORACLE,
    doc="Simplified (centroid-based) silhouette of the corpus's OWN "
    "label partition: a = cosine distance to the own-label centroid, "
    "b = min distance to any OTHER centroid, s = (b-a)/max(a,b), "
    "mean s per label with the misassigned count (s < 0 — closer to "
    "a foreign centroid than home). The METRIC-SPACE twin of "
    "graph_modularity: modularity asks whether the similarity GRAPH "
    "agrees with the labels, this asks raw embedding space — the "
    "pair disagreeing localizes WHERE curation labels break down. "
    "Linear n x k centroid distances (never the O(n^2) full "
    "silhouette); centroid components quantize e9 and per-vector "
    "scores e6 BEFORE the per-label reduction (exact integer sums); "
    "a single-label corpus emits degenerate-flagged rows (b "
    "undefined), never drops.",
)
def cluster_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import load_fanned
    from emr_with_custom_metrics_spark.functions.vector import cosine

    e = load_fanned(spark, sf_dir, "embeddings")
    comp = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    cents = (
        comp.groupBy("label", "pos")
        .agg(
            (F.round(F.avg("val") * 1000000000) / 1000000000.0).alias(
                "c"
            )
        )
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "c"))).alias(
                "pairs"
            )
        )
        .select(
            F.col("label").alias("cl"),
            F.transform("pairs", lambda p: p["c"]).alias("centroid"),
        )
    )
    dist = (
        e.select("vec_id", F.col("label").alias("own"), "embedding")
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "own",
            "cl",
            (
                F.lit(1000000)
                - F.round(
                    cosine(F.col("embedding"), F.col("centroid"))
                    * 1000000
                ).cast("bigint")
            ).alias("d_e6"),
        )
    )
    ab = dist.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("cl") == F.col("own"), F.col("d_e6")))
        .cast("bigint")
        .alias("a_e6"),
        F.min(F.when(F.col("cl") != F.col("own"), F.col("d_e6")))
        .cast("bigint")
        .alias("b_e6"),
    )
    s_e6 = (
        F.when(F.col("b_e6").isNull(), F.lit(None).cast("bigint"))
        .when(
            F.greatest(F.col("a_e6"), F.col("b_e6")) <= 0,
            F.lit(0).cast("bigint"),
        )
        .otherwise(
            F.round(
                (F.col("b_e6").cast("double") - F.col("a_e6"))
                / F.greatest(F.col("a_e6"), F.col("b_e6"))
                * 1000000
            ).cast("bigint")
        )
    )
    s = ab.select("vec_id", "own", s_e6.alias("s_e6"))
    return s.groupBy(F.col("own").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.when(
            F.count("s_e6") > 0,
            F.round(
                F.sum("s_e6").cast("double") / F.count("s_e6")
            ).cast("bigint"),
        )
        .otherwise(F.lit(None).cast("bigint"))
        .cast("bigint")
        .alias("mean_sil_e6"),
        F.count(F.when(F.col("s_e6") < 0, 1))
        .cast("bigint")
        .alias("n_negative"),
        (F.count("s_e6") == 0).alias("degenerate"),
    )


# ---------------------------------------------------------------------------
# Anisotropy
# ---------------------------------------------------------------------------
_ANISO_TMPL = f"""
    WITH norms AS (
        SELECT vec_id, {{norm}} AS nrm FROM {{src}}
    ), comp AS (
        -- unit-vector components quantized e9 BEFORE the component
        -- sums, so S_j is an exact integer in BOTH engines (inside
        -- int64 through ~9e9 vectors — documented bound); positions
        -- length-driven, never a hardcoded dimension
        SELECT t.i,
               CAST(ROUND({{elem}} / n.nrm * 1000000000) AS BIGINT)
                   AS u_e9
        FROM {{src}} e
        JOIN norms n ON n.vec_id = e.vec_id
        {{lat}}
        WHERE n.nrm > 0
    ), sums AS (
        SELECT i, CAST(SUM(u_e9) AS BIGINT) AS s_e9
        FROM comp GROUP BY i
    ), terms AS (
        -- per-component ||sum u||^2 term, e6-quantized per component
        -- then summed exactly (64 fixed terms — never an ordered
        -- double reduction)
        SELECT CAST(ROUND(CAST(s_e9 AS DOUBLE) * s_e9 / 1000000000000.0e0)
                    AS BIGINT) AS t_e6
        FROM sums
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN {{norm_e}} <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_zero_norm
        FROM {{src}} e2
    ), tot AS (
        SELECT CAST(COALESCE(SUM(t_e6), 0) AS BIGINT) AS ssq_e6 FROM terms
    )
    SELECT nn.n AS n_vectors, nn.n_zero_norm,
           CASE WHEN nn.n - nn.n_zero_norm > 1
                THEN CAST(ROUND(
                     (tot.ssq_e6 / 1000000.0e0
                      - (nn.n - nn.n_zero_norm))
                     / (CAST(nn.n - nn.n_zero_norm AS DOUBLE)
                        * (nn.n - nn.n_zero_norm - 1))
                     * 1000000000) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS anisotropy_e9,
           CASE WHEN nn.n - nn.n_zero_norm > 0
                THEN CAST(ROUND(sqrt(tot.ssq_e6 / 1000000.0e0)
                     / (nn.n - nn.n_zero_norm) * 1000000) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS mean_vector_norm_e6,
           nn.n - nn.n_zero_norm <= 1 AS degenerate
    FROM nn CROSS JOIN tot
"""


def _aniso_sql(engine: str) -> str:
    if engine == "spark":
        return _ANISO_TMPL.format(
            src="embeddings",
            norm=(
                "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), "
                "(a, v) -> a + CAST(v AS DOUBLE) * v))"
            ),
            norm_e=(
                "sqrt(aggregate(e2.embedding, CAST(0.0 AS DOUBLE), "
                "(a, v) -> a + CAST(v AS DOUBLE) * v))"
            ),
            elem="CAST(element_at(e.embedding, t.i) AS DOUBLE)",
            lat=(
                "LATERAL VIEW explode(sequence(1, size(e.embedding))) "
                "t AS i"
            ),
        )
    return _ANISO_TMPL.format(
        src="embeddings",
        norm=(
            "sqrt(list_sum(list_transform(embedding::DOUBLE[], "
            "x -> x * x)))"
        ),
        norm_e=(
            "sqrt(list_sum(list_transform(e2.embedding::DOUBLE[], "
            "x -> x * x)))"
        ),
        elem="e.embedding[t.i]::DOUBLE",
        lat="CROSS JOIN UNNEST(range(1, len(e.embedding) + 1)) AS t(i)",
    )


@register(
    "embedding_anisotropy",
    oracle=_aniso_sql("duck"),
    doc="Ethayarajh 2019 anisotropy of the embedding collection: the "
    "expected pairwise cosine of unit-normalized vectors via the "
    "EXACT identity E[cos] = (||sum u||^2 - n)/(n(n-1)) — one pass, "
    "no pair join at ANY scale (the definition is quadratic; the "
    "identity is linear). Near-zero = directions spread (cosine "
    "similarity informative); large = a shared dominant direction "
    "makes every cosine big and the whole similarity/dedup/ANN stack "
    "less discriminative — the one-number screen run BEFORE trusting "
    "those rows. Unit components quantize e9 per row so component "
    "sums are exact int64 (documented ~9e9-vector bound); the 64 "
    "squared-sum terms quantize e6 each before one exact final sum; "
    "zero-norm vectors are excluded and counted; n <= 1 flags "
    "degenerate. Also emits ||mean unit vector|| — the same geometry "
    "as a length.",
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import load_fanned

    load_fanned(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_aniso_sql("spark"))
