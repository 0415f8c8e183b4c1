"""Embedding-column analytics: int8 quantization, covariance (the PCA
precursor), and Lloyd's k-means — all over the ``embeddings`` table's
``array<float>`` column, all JVM-side (array HOFs / built-in aggregates,
no Python UDF in any hot path).

No reference analogue (§2B mandate). Scale notes per operator; the common
theme is that per-vector work is map-side and the only shuffles carry
fixed-size state (d² co-moments, k·d centroid sums) — never vectors.

Float determinism: per-vector HOF folds (``aggregate``) run
left-to-right over the same 64 elements in both engines, so derived
scalars are bit-stable; cross-row aggregates (covariance, inertia) are
summation-order-dependent and are rounded to 6 dp on both sides, leaving
~9 orders of magnitude between fp jitter (~1e-15 rel) and the rounding
step. k-means emits integer sizes plus rounded inertia and is held to a
convergence test instead of an oracle (iteration count × float drift can
flip a boundary assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_fanned, load_table
from emr_with_custom_metrics_spark.registry import register


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH q AS (
        -- CAST to DOUBLE on both operands: DuckDB otherwise divides
        -- DECIMAL/FLOAT in float32 while Spark promotes to double
        SELECT vec_id,
               CAST(127.0 AS DOUBLE)
               / CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
                   AS scale
        FROM embeddings
        WHERE list_max(list_transform(embedding, x -> abs(x))) > 0
    )
    SELECT e.vec_id,
           CAST((CAST(ROUND((q.scale) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS DOUBLE) AS scale,
           CAST(list_aggregate(list_transform(e.embedding,
                    x -> CAST(round(x * q.scale) AS BIGINT)), 'sum') AS BIGINT)
               AS code_sum,
           CAST(list_max(list_transform(e.embedding,
                    x -> abs(CAST(round(x * q.scale) AS BIGINT)))) AS BIGINT)
               AS max_abs_code
    FROM embeddings e JOIN q ON e.vec_id = q.vec_id
    """,
    doc="Symmetric int8 quantization: per-vector scale = 127/max|x|, "
    "codes = round(x·scale) ∈ [-127, 127]. Emits integer checksums "
    "(code sum, max |code|) rather than the code arrays — integers "
    "hash-match exactly across engines, and max_abs_code = 127 for every "
    "vector is the saturation invariant. Pure map-side HOF work: at "
    "100 TB this is a scan-shaped pass that writes 16× smaller vectors, "
    "no shuffle at all.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_fanned(spark, sf_dir, "embeddings")
    amax = F.array_max(F.expr("transform(embedding, x -> abs(x))"))
    # project the per-vector scale once; the code lambdas reference it as
    # an outer attribute instead of recomputing the array max per element
    scaled = e.where(amax > 0).select(
        "vec_id", "embedding", (F.lit(127.0) / amax.cast("double")).alias("vscale")
    )
    codes = F.expr("transform(embedding, x -> cast(round(x * vscale) as bigint))")
    return scaled.select(
        "vec_id",
        (F.round((F.col("vscale")) * 1000000).cast("bigint") / 1000000.0).cast("double").alias("scale"),
        F.aggregate(codes, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("code_sum"),
        F.array_max(F.transform(codes, lambda c: F.abs(c))).alias("max_abs_code"),
    )


@register(
    "embedding_covariance",
    oracle="""
    WITH pairs AS (
        SELECT a.i AS i, b.i AS j
        FROM (SELECT UNNEST(range(8)) AS i) a,
             (SELECT UNNEST(range(8)) AS i) b
        WHERE a.i <= b.i
    )
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST((CAST(ROUND((COVAR_SAMP(embedding[i + 1], embedding[j + 1])) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS DOUBLE)
               AS cov
    FROM embeddings, pairs
    GROUP BY i, j
    """,
    doc="Sample covariance over the first 8 embedding dimensions — the "
    "d×d co-moment matrix that feeds a driver-side eigendecomposition "
    "for PCA (d² numbers; the eigensolve is O(d³) on d≪1000, never a "
    "cluster job). The 36-row dim-pair table broadcasts onto the "
    "vectors; each covariance is one built-in COVAR_SAMP over "
    "element_at — the shuffle carries 36 co-moment triples, not "
    "vectors. At full d=64 that's 2080 pairs: same plan, still "
    "broadcast-side. Rounded to 6 dp (merge-order fp jitter ~1e-15).",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dims = spark.range(8).select(F.col("id").cast("int").alias("i"))
    pairs = dims.crossJoin(dims.select(F.col("i").alias("j"))).where(F.col("i") <= F.col("j"))
    return (
        e.crossJoin(F.broadcast(pairs))
        .groupBy("i", "j")
        .agg(
            (F.round((F.covar_samp(
                    F.element_at("embedding", F.col("i") + 1),
                    F.element_at("embedding", F.col("j") + 1),
                )) * 1000000).cast("bigint") / 1000000.0)
            .cast("double")
            .alias("cov")
        )
    )


_KM_K = 8
_KM_ITERS = 3
_KM_D = 64


def _km_frags(dialect: str):
    """Dialect-bound SQL fragments shared by the one-string chain
    (_kmeans_sql — the DuckDB oracle and the reference form) and the
    staged Spark executor (_kmeans_spark_staged). The per-vector argmin
    is dialect-split on PLAN SHAPE only (same (d2, cid) lexicographic
    tie-break): Spark aggregates min(struct(d2, cid)) — partial-
    aggregable map-side, no per-vector window sort (measured 3.10 → ~2 s
    at sf0.1 vs the ROW_NUMBER form); DuckDB keeps ROW_NUMBER, its
    natural argmin."""
    if dialect == "spark":
        rng = f"(SELECT explode(sequence(0, {_KM_D - 1})) AS i)"
        idx = lambda arr, k: f"element_at({arr}, {k})"  # noqa: E731
        tx = "transform"
        fold = lambda terms: f"aggregate({terms}, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"  # noqa: E731
        seq = f"sequence(0, {_KM_D - 1})"
        collect = "transform(sort_array(collect_list(struct(i, mu))), s -> s.mu)"
        emb = lambda k: f"CAST(element_at(embedding, {k}) AS DOUBLE)"  # noqa: E731
        asn = lambda src: (  # noqa: E731
            f"SELECT vec_id, first(embedding) AS embedding, "
            f"min(named_struct('d2', d2, 'cid', cid)).cid AS cid "
            f"FROM {src} GROUP BY vec_id"
        )
        afin = lambda src: (  # noqa: E731
            f"SELECT vec_id, s.cid AS cid, s.d2 AS d2 FROM ("
            f"SELECT vec_id, min(named_struct('d2', d2, 'cid', cid)) AS s "
            f"FROM {src} GROUP BY vec_id)"
        )
    else:
        rng = f"(SELECT UNNEST(range({_KM_D})) AS i)"
        idx = lambda arr, k: f"{arr}[{k}]"  # noqa: E731
        tx = "list_transform"
        fold = lambda terms: (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), "  # noqa: E731
                              "(a, x) -> a + x)")
        seq = f"range(0, {_KM_D})"
        collect = "list(mu ORDER BY i)"
        emb = lambda k: f"CAST(embedding[{k}] AS DOUBLE)"  # noqa: E731
        asn = lambda src: (  # noqa: E731
            f"SELECT vec_id, embedding, cid FROM ("
            f"SELECT vec_id, embedding, cid, "
            f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn "
            f"FROM {src}) WHERE rn = 1"
        )
        afin = lambda src: (  # noqa: E731
            f"SELECT vec_id, cid, d2 FROM ("
            f"SELECT vec_id, cid, d2, "
            f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn "
            f"FROM {src}) WHERE rn = 1"
        )

    def d2(cent: str) -> str:
        diff = f"({emb('d + 1')} - {idx(cent, 'd + 1')})"
        return fold(f"{tx}({seq}, d -> {diff} * {diff})")

    return rng, idx, tx, fold, seq, collect, emb, d2, asn, afin


def _kmeans_sql(dialect: str) -> str:
    """One template, two dialects (the PCA/LR recipe applied to Lloyd's
    k-means — r6 VERDICT item 5): every float reduction is either an
    ORDERED left fold over the 64 dims (identical IEEE op sequence in
    both engines) or an AVG/SUM immediately ROUNDed (6 dp for centroid
    cells, 4 dp for inertia) so sum-order divergence between engines
    (~1e-12 relative) washes out — the same argument proven hash-green
    by embedding_covariance and embedding_pca_project. The argmin
    tie-breaks on (d2, cid) via ROW_NUMBER, so boundary assignments are
    deterministic too. Empty clusters keep their previous centroid
    (COALESCE against the prior round)."""
    rng, idx, tx, fold, seq, collect, emb, d2, asn, afin = _km_frags(dialect)

    parts = [f"""
    WITH c0 AS (
        -- seed rank runs over the K-row LIMIT subset (TakeOrdered on
        -- Spark), never a ROW_NUMBER over every vector (r11 audit rule)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
               {tx}({seq}, d -> {emb('d + 1')}) AS centroid
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY vec_id LIMIT {_KM_K}) s0)"""]
    for it in range(_KM_ITERS):
        parts.append(f""",
    a{it} AS (
        SELECT vec_id, embedding, cid, {d2('centroid')} AS d2
        FROM embeddings, c{it}),
    asn{it} AS ({asn(f'a{it}')}),
    mean{it} AS (
        SELECT cid, i, (CAST(ROUND((AVG({emb('i + 1')})) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS mu
        FROM asn{it}, {rng} r GROUP BY cid, i),
    cm{it} AS (
        SELECT c.cid, r.i,
               COALESCE(m.mu, {idx('c.centroid', 'r.i + 1')}) AS mu
        FROM c{it} c CROSS JOIN {rng} r
        LEFT JOIN mean{it} m ON m.cid = c.cid AND m.i = r.i),
    c{it + 1} AS (
        SELECT cid, {collect} AS centroid FROM cm{it} GROUP BY cid)""")
    final_src = (
        f"(SELECT vec_id, embedding, cid, {d2('centroid')} AS d2 "
        f"FROM embeddings, c{_KM_ITERS})"
    )
    parts.append(f""",
    afin AS ({afin(final_src)})
    SELECT cid, COUNT(*) AS n_points, CAST(ROUND(SUM(d2) * 10000) AS BIGINT) AS inertia_e4
    FROM afin GROUP BY cid""")
    return "".join(parts)


@register(
    "kmeans_embeddings",
    # Upgraded rows-only → hash-oracled in round 7 (r6 VERDICT item 5) via
    # the ordered-fold chained-CTE recipe: assignments, centroid updates,
    # and inertia are all deterministic and replayed identically by DuckDB.
    oracle=_kmeans_sql("duckdb"),
    doc="Lloyd's k-means (k=8, d=64, 3 iterations) as one generated CTE "
    "chain, hash-verified end to end: deterministic k-lowest-vec_id "
    "init, distances as ORDERED folds over the dims (identical IEEE "
    "sequence in both engines), argmin tie-broken on (d2, cid), centroid "
    "cells ROUND(AVG, 6) so engine sum-order divergence washes out (the "
    "embedding_covariance argument), empty clusters retain their prior "
    "centroid, inertia an integer 1e-4-unit BIGINT. Plan shape at scale: per round the "
    "k·d centroid table broadcasts onto the vectors (Catalyst picks BHJ "
    "at these sizes), the per-vector argmin is a vec_id-partitioned "
    "aggregation, and the update shuffle carries k·d cell sums — raw "
    "vectors never shuffle. The min_by/localCheckpoint DataFrame variant "
    "(_kmeans_df) remains the long-iteration production path; 3 rounds "
    "keeps the analyzer cost of the CTE chain trivial (~20 CTEs).",
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("embeddings",))
    return _kmeans_spark_staged(spark)


def _kmeans_spark_staged(spark: SparkSession) -> DataFrame:
    """Execute the Lloyd chain round-by-round behind checkpointed views.

    Opt r15 (guide §2.4/§3.3): in the single WITH-chain form every
    ``c{it+1}`` references ``c{it}`` TWICE (the assignment pass and the
    empty-cluster COALESCE), so Spark's inlining doubled the subtree per
    round — the executed plan held 32 embeddings scans / 92 Exchanges at
    3 rounds (plans/r15/kmeans_embeddings_before.txt). Staging each
    round's k·d-cell centroid table (8 rows) behind an eager
    localCheckpoint + temp view leaves 5 scans — one per assignment pass
    plus the seed — with arithmetic (and therefore answers) identical:
    each CTE's SQL text is unchanged, it just executes once. The DuckDB
    oracle keeps the one-string chain (_kmeans_sql('duckdb')): DuckDB
    materializes multi-referenced CTEs itself."""
    frag = _km_frags("spark")
    rng, idx, tx, fold, seq, collect, emb, d2, asn, afin = frag
    spark.sql(
        f"""
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
               {tx}({seq}, d -> {emb('d + 1')}) AS centroid
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY vec_id LIMIT {_KM_K}) s0"""
    ).localCheckpoint().createOrReplaceTempView("km_c0")
    for it in range(_KM_ITERS):
        spark.sql(
            f"""
            WITH a AS (
                SELECT vec_id, embedding, cid, {d2('centroid')} AS d2
                FROM embeddings, km_c{it}),
            asn AS ({asn('a')}),
            mean AS (
                SELECT cid, i, (CAST(ROUND((AVG({emb('i + 1')})) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS mu
                FROM asn, {rng} r GROUP BY cid, i),
            cm AS (
                SELECT c.cid, r.i,
                       COALESCE(m.mu, {idx('c.centroid', 'r.i + 1')}) AS mu
                FROM km_c{it} c CROSS JOIN {rng} r
                LEFT JOIN mean m ON m.cid = c.cid AND m.i = r.i)
            SELECT cid, {collect} AS centroid FROM cm GROUP BY cid"""
        ).localCheckpoint().createOrReplaceTempView(f"km_c{it + 1}")
    return spark.sql(
        f"""
        WITH afin AS ({afin(
            f"(SELECT vec_id, embedding, cid, {d2('centroid')} AS d2 "
            f"FROM embeddings, km_c{_KM_ITERS})"
        )})
        SELECT cid, COUNT(*) AS n_points, CAST(ROUND(SUM(d2) * 10000) AS BIGINT) AS inertia_e4
        FROM afin GROUP BY cid"""
    )


def _kmeans_df(spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3) -> DataFrame:
    from pyspark.sql import Window

    e = load_fanned(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # deterministic init: the k lowest vec_ids (no rand(); reproducible)
    centroids = (
        e.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cid"),
            F.col("embedding").alias("centroid"),
        )
    )

    dist2 = F.aggregate(
        F.zip_with("embedding", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    for _ in range(iters):
        assigned = (
            e.crossJoin(F.broadcast(centroids))
            .select("vec_id", "embedding", "cid", dist2.alias("d2"))
            .groupBy("vec_id")
            .agg(
                F.min_by("cid", "d2").alias("cid"),
                F.first("embedding").alias("embedding"),
                F.min("d2").alias("d2"),
            )
        )
        centroids = (
            assigned.select("cid", F.posexplode("embedding").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("mean"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                    lambda s: s["mean"].cast("float"),
                ).alias("centroid")
            )
            .localCheckpoint(eager=False)
        )

    final = (
        e.crossJoin(F.broadcast(centroids))
        .select("vec_id", dist2.alias("d2"), "cid")
        .groupBy("vec_id")
        .agg(F.min_by("cid", "d2").alias("cid"), F.min("d2").alias("d2"))
    )
    return final.groupBy("cid").agg(
        F.count("*").alias("n_points"),
        # integer 1e-4-unit inertia OUTPUT (r7 VERDICT item 2)
        F.round(F.sum("d2") * 10000).cast("bigint").alias("inertia_e4"),
    )


_PCA_ITERS = 60


def _pca_sql(dialect: str) -> str:
    """One template, two dialects: PCA first-component projection as pure
    SQL — covariance (rounded to 6 dp, which makes both engines' matrices
    BIT-IDENTICAL; proven by embedding_covariance's hash-green history),
    then ``_PCA_ITERS`` power-iteration rounds as generated CTEs whose
    mat-vec and norm are ORDERED left folds (identical IEEE op sequence in
    both engines), then the projection fold per vector. The only
    engine-variant parts are list-indexing / fold spellings."""
    if dialect == "spark":
        rng8 = "(SELECT explode(sequence(0, 7)) AS i)"
        idx = lambda arr, k: f"element_at({arr}, {k})"  # noqa: E731
        tx = "transform"
        fold = lambda terms: f"aggregate({terms}, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"  # noqa: E731
        seq8 = "sequence(0, 7)"
        mk_c = ("SELECT transform(sort_array(collect_list(struct(k, cov))), "
                "s -> s.cov) AS m FROM covfull")
        emb = lambda k: f"CAST(element_at(embedding, {k}) AS DOUBLE)"  # noqa: E731
    else:
        rng8 = "(SELECT UNNEST(range(8)) AS i)"
        idx = lambda arr, k: f"{arr}[{k}]"  # noqa: E731
        tx = "list_transform"
        fold = lambda terms: (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), "  # noqa: E731
                              "(a, x) -> a + x)")
        seq8 = "range(0, 8)"
        mk_c = "SELECT list(CAST(cov AS DOUBLE) ORDER BY k) AS m FROM covfull"
        emb = lambda k: f"CAST(embedding[{k}] AS DOUBLE)"  # noqa: E731

    parts = [f"""
    WITH pairs AS (
        SELECT a.i AS i, b.i AS j FROM {rng8} a, {rng8} b WHERE a.i <= b.i
    ), cov AS (
        SELECT i, j,
               (CAST(ROUND((COVAR_SAMP({emb('i + 1')}, {emb('j + 1')})) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS cov
        FROM embeddings, pairs GROUP BY i, j
    ), covfull AS (
        SELECT i * 8 + j AS k, cov FROM cov
        UNION ALL
        SELECT j * 8 + i, cov FROM cov WHERE i < j
    ), c AS ({mk_c}),
    w0 AS (SELECT {tx}({seq8}, z -> CASE WHEN z = 0 THEN CAST(1.0 AS DOUBLE)
                                         ELSE CAST(0.0 AS DOUBLE) END) AS v)"""]
    for it in range(_PCA_ITERS):
        terms = f"{tx}({seq8}, j -> {idx('m', 'i * 8 + j + 1')} * {idx('v', 'j + 1')})"
        mv = f"{tx}({seq8}, i -> {fold(terms)})"
        sq = f"{tx}(v, x -> x * x)"
        parts.append(f""",
    mv{it} AS (SELECT {mv} AS v FROM c, w{it}),
    w{it + 1} AS (SELECT {tx}(v, y -> y / sqrt({fold(sq)})) AS v FROM mv{it})""")
    proj_terms = f"{tx}({seq8}, d -> {emb('d + 1')} * {idx('v', 'd + 1')})"
    parts.append(f"""
    SELECT vec_id, CAST(ROUND(({fold(proj_terms)}) * 1000000) AS BIGINT) AS pc1_e6
    FROM embeddings, w{_PCA_ITERS}""")
    return "".join(parts)


@register(
    "embedding_pca_project",
    oracle=_pca_sql("duckdb"),
    doc="PCA first-principal-component projection, end to end in-engine: "
    "distributed covariance (the only corpus-scale pass — d^2 co-moments "
    "cross the shuffle, never vectors), 60 power-iteration rounds on the "
    "8x8 matrix expressed as array-HOF mat-vecs over a single row (the "
    "d^2-sized 'driver work' stays declarative), then one distributed "
    "projection fold per vector. Rounding the covariance at 6 dp first "
    "makes both engines' matrices bit-identical, and every downstream "
    "sum is an ORDERED fold — so a genuinely iterative float algorithm "
    "hash-verifies exactly, the same trick as the BPE/LPA schedules. 100 "
    "rounds because the synthetic embeddings are nearly isotropic "
    "(lambda2/lambda1 = 0.946, measured): contamination 0.946^60 = "
    "0.036, variance error ~4e-4 relative. The generated 120-CTE chain "
    "exceeds the analyzer's default fixed-point budget, so the rule "
    "budget is raised around the one spark.sql call and restored. At "
    "d=64: 2080 co-moments, same plan.",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged execution (round 7): the one-statement 120-CTE chain spent
    ~6 s at sf0.1 almost entirely in ANALYSIS (Spark re-resolves the
    whole chain; DuckDB materializes CTEs so the oracle keeps the single
    statement). Identical math, chunked: the covariance matrix and the
    iterate vector live behind localCheckpoints, and the 60 power
    iterations run as 6 statements of 10 rounds each. The differential
    test pins the one-statement spark form equal."""
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("embeddings",))
    fold = lambda terms: f"aggregate({terms}, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"  # noqa: E731
    mv_terms = "transform(sequence(0, 7), j -> element_at(m, i * 8 + j + 1) * element_at(v, j + 1))"
    mv = f"transform(sequence(0, 7), i -> {fold(mv_terms)})"
    sq = "transform(v, x -> x * x)"
    state = spark.sql("""
        WITH pairs AS (
            SELECT a.i AS i, b.i AS j
            FROM (SELECT explode(sequence(0, 7)) AS i) a,
                 (SELECT explode(sequence(0, 7)) AS i) b
            WHERE a.i <= b.i
        ), cov AS (
            SELECT i, j,
                   (CAST(ROUND((COVAR_SAMP(CAST(element_at(embedding, i + 1) AS DOUBLE),
                                    CAST(element_at(embedding, j + 1) AS DOUBLE))) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS cov
            FROM embeddings, pairs GROUP BY i, j
        ), covfull AS (
            SELECT i * 8 + j AS k, cov FROM cov
            UNION ALL
            SELECT j * 8 + i, cov FROM cov WHERE i < j
        )
        SELECT (SELECT transform(sort_array(collect_list(struct(k, cov))),
                                 s -> s.cov) FROM covfull) AS m,
               transform(sequence(0, 7),
                         z -> CASE WHEN z = 0 THEN CAST(1.0 AS DOUBLE)
                                   ELSE CAST(0.0 AS DOUBLE) END) AS v
    """).localCheckpoint(eager=False)
    chunk = 10
    for start in range(0, _PCA_ITERS, chunk):
        state.createOrReplaceTempView("pca_state")
        parts = ["WITH w0 AS (SELECT m, v FROM pca_state)"]
        for it in range(chunk):
            parts.append(f""",
            mv{it} AS (SELECT m, {mv} AS v FROM w{it}),
            w{it + 1} AS (SELECT m, transform(v, y -> y / sqrt({fold(sq)})) AS v
                          FROM mv{it})""")
        parts.append(f" SELECT m, v FROM w{chunk}")
        state = spark.sql("".join(parts)).localCheckpoint(eager=False)
    state.createOrReplaceTempView("pca_state")
    proj_terms = ("transform(sequence(0, 7), "
                  "d -> CAST(element_at(embedding, d + 1) AS DOUBLE) "
                  "* element_at(v, d + 1))")
    return spark.sql(f"""
        SELECT vec_id, CAST(ROUND(({fold(proj_terms)}) * 1000000) AS BIGINT) AS pc1_e6
        FROM embeddings, pca_state
    """)


def _pca_project_one_statement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original single-statement spark form — kept for the
    differential test that proves the staged runner computes the same
    trajectory."""
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("embeddings",))
    key = "spark.sql.analyzer.maxIterations"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "1000")
    try:
        # spark.sql analyzes eagerly, so the bump is only needed here
        return spark.sql(_pca_sql("spark"))
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (64 -> 16 dims) with a measured
# distortion report
# ---------------------------------------------------------------------------
# The dimensionality-reduction stage that precedes ANN indexing at scale:
# project onto k=16 md5-derived Rademacher (+/-1) hyperplanes — the same
# deterministic sign family similarity_ann_lsh established (E[(r.x)^2] =
# ||x||^2 for Rademacher r, so the sum over 16 planes estimates 16x the
# squared distance) — over vectors quantized to exact 1e-6 BIGINTs, making
# every projection and every distance an exact integer. The registered
# query grades the transform: for all pairs of a 40-vector slice it emits
# projected-vs-original squared-distance distortion, whose mean should sit
# near 1.0 (pinned in tests; JL says concentration tightens as k grows).

_RP_DIMS = 64
_RP_K = 16


def _rp_sql(dialect: str) -> str:
    if dialect == "spark":
        planes = """
        SELECT d.id AS d, k.id AS k,
               2 * (CAST(conv(substring(md5(concat('rp|',
                   CAST(k.id AS STRING), '|', CAST(d.id AS STRING))), 1, 1),
                   16, 10) AS INT) % 2) - 1 AS sign
        FROM range(0, 64) d CROSS JOIN range(0, 16) k"""
        qv = ("transform(embedding, x -> "
              "CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        idx = "q.qv[p.d]"  # Spark [] is 0-based
        pv = ("transform(array_sort(collect_list(struct(k, dot))), "
              "s -> s.dot)")
        pair_d2 = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
                   "CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    else:
        planes = """
        SELECT d.d AS d, k.k AS k,
               2 * (CAST('0x' || substr(md5('rp|' || CAST(k.k AS VARCHAR)
                   || '|' || CAST(d.d AS VARCHAR)), 1, 1) AS INT) & 1) - 1
                   AS sign
        FROM RANGE(0, 64) d(d), RANGE(0, 16) k(k)"""
        qv = ("list_transform(embedding::DOUBLE[], "
              "x -> CAST(ROUND(x * 1000000) AS BIGINT))")
        idx = "q.qv[p.d + 1]"  # DuckDB [] is 1-based
        pv = "list(dot ORDER BY k)"
        pair_d2 = ("CAST(list_sum(list_transform(range(1, len({a}) + 1), "
                   "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)")
    return f"""
    WITH q AS (
        SELECT vec_id, {qv} AS qv FROM embeddings WHERE vec_id < 40
    ), planes AS ({planes}
    ), dots AS (
        SELECT q.vec_id, p.k, CAST(SUM({idx} * p.sign) AS BIGINT) AS dot
        FROM q CROSS JOIN planes p GROUP BY q.vec_id, p.k
    ), pv AS (
        SELECT vec_id, {pv} AS pv FROM dots GROUP BY vec_id
    ), pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               {pair_d2.format(a="a.qv", b="b.qv")} AS orig_d2
        FROM q a JOIN q b ON a.vec_id < b.vec_id
    ), proj AS (
        SELECT x.a_id, x.b_id, x.orig_d2,
               {pair_d2.format(a="pa.pv", b="pb.pv")} AS proj_d2
        FROM pairs x
        JOIN pv pa ON pa.vec_id = x.a_id
        JOIN pv pb ON pb.vec_id = x.b_id
        WHERE x.orig_d2 > 0
    )
    SELECT a_id, b_id, orig_d2, proj_d2,
           CAST(ROUND(CAST(proj_d2 AS DOUBLE) / (16 * orig_d2) * 1000000)
               AS BIGINT) AS distortion_e6
    FROM proj
    """


@register(
    "embedding_random_projection",
    oracle=_rp_sql("duck"),
    doc="Johnson-Lindenstrauss random projection 64 -> 16 dims via "
    "md5-derived Rademacher (+/-1) hyperplanes over 1e-6-quantized "
    "integer vectors (the similarity_ann_lsh sign family — no gaussians, "
    "no transcendentals, exact integer projections on both engines), "
    "graded by its own distortion report: for every pair of a 40-vector "
    "slice, projected squared distance over 16x original squared "
    "distance, which JL concentrates around 1. At 100 TB the transform "
    "is one broadcast 1024-row sign table and a map-side integer "
    "aggregation per vector — 4x less vector payload into every "
    "downstream shuffle; the all-pairs grading slice is the labeled "
    "demo (production grades on a sample exactly like this one).",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_rp_sql("spark"))
