"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline. Queries are broadcast
  (small side), candidates streamed — no shuffle on the big side until the
  per-query top-k window. Dot products run JVM-side via F.zip_with +
  F.aggregate (whole-stage codegen, no Python).
- LSH-bucketed variant (random signed projections): the 100 TB path — each
  vector hashes to a b-bit bucket; join happens per bucket so the candidate
  set shrinks ~2^b-fold. Hyperplanes are seeded deterministically from
  md5-derived pseudo-randoms, so results are reproducible with no RNG state.
- embedding cosine near-dup: all pairs above a cosine threshold (the
  embedding flavor of dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: (query_id, rank, neighbor_id).

    Ties broken by neighbor id; self excluded. Queries broadcast.
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = (_dot(F.col("qv"), F.col("cv"))
           / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    scored = joined.select("query_id", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a hash chain (no RNG)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        vals = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()
            # map first 8 hex chars to [-1, 1)
            vals.append(int(h[:8], 16) / 0x80000000 - 1.0)
        planes.append(vals)
    return planes


def lsh_buckets(emb: DataFrame, dim: int, n_planes: int = 8, seed: int = 42,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Signed-random-projection bucket id per vector (JVM-side)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for b, plane in enumerate(planes):
        parr = F.array(*[F.lit(v) for v in plane])
        sign = (_dot(F.col(vec_col), parr) > 0).cast("int")
        bucket = bucket + F.shiftleft(sign, b)
    return emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding"),
                      bucket.alias("bucket"))


def lsh_ann(emb: DataFrame, dim: int, query_ids: list[int], k: int = 3,
            n_planes: int = 6, seed: int = 42) -> DataFrame:
    """Bucketed ANN: exact cosine, but only within the query's LSH bucket."""
    # no cache (leak per invocation); bucket ids are cheap JVM expressions
    bucketed = lsh_buckets(emb, dim, n_planes, seed)
    q = bucketed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("bucket").alias("cb"),
    )
    joined = F.broadcast(q).join(c, F.col("qb") == F.col("cb")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = (_dot(F.col("qv"), F.col("cv"))
           / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    scored = joined.select("query_id", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def cosine_near_dups(emb: DataFrame, threshold: float = 0.95,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold, a<b)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        joined.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


def cosine_topk_sql(query_ids: list[int], k: int = 3,
                    table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, c.embedding) AS sim
  FROM {table} q JOIN {table} c ON q.vec_id != c.vec_id
  WHERE q.vec_id IN ({ids})
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {k}
"""


# -- IVF (inverted-file) ANN -------------------------------------------------

def ivf_train_centroids(emb: DataFrame, n_centroids: int = 8, iters: int = 3,
                        id_col: str = "vec_id", vec_col: str = "embedding"
                        ) -> list[list[float]]:
    """Deterministic Lloyd's k-means over the embedding column.

    Init = the n vectors with smallest xxhash64(id) (seeded, no RNG); each
    iteration is one Spark job (assign JVM-side, per-dimension means via
    posexplode groupBy). Centroids are tiny (n x dim) and live on the
    driver / in broadcasts — the scale path: assignment scans are
    embarrassingly parallel, the mean-reduce shuffles n_centroids x dim
    cells regardless of corpus size.
    """
    init_rows = (
        emb.orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_centroids).select(vec_col).collect()
    )
    centroids = [list(r[0]) for r in init_rows]
    for _ in range(iters):
        assigned = ivf_assign(emb, centroids, id_col, vec_col)
        means = (
            assigned.select("centroid", F.posexplode(vec_col))
            .groupBy("centroid", "pos").agg(F.avg("col").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        by_c: dict = {}
        for r in means:
            by_c.setdefault(r["centroid"], {})[r["pos"]] = r["m"]
        for cid, dims in by_c.items():
            new[cid] = [dims[i] for i in range(len(dims))]
        centroids = new
    return centroids


def ivf_assign(emb: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """Nearest-centroid (by cosine) id per vector — pure JVM expressions:
    argmax via array_max over (sim, idx) structs."""
    v = F.col(vec_col)
    cands = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(x) for x in c])
        sim = _dot(v, carr) / (_norm(v) * _norm(carr))
        cands.append(F.struct(sim.alias("s"), F.lit(i).alias("i")))
    best = F.array_max(F.array(*cands))["i"]
    return emb.select(F.col(id_col).alias("vec_id"),
                      v.alias(vec_col),
                      best.alias("centroid"))


def ivf_ann(emb: DataFrame, query_ids: list[int], k: int = 3,
            n_centroids: int = 8, nprobe: int = 2, iters: int = 3,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: coarse quantizer buckets + exact cosine within the query's
    nprobe nearest buckets. nprobe == n_centroids degenerates to exact
    brute force (the oracle-checked configuration)."""
    centroids = ivf_train_centroids(emb, n_centroids, iters, id_col, vec_col)
    # no cache: assignment is cheap JVM expressions over broadcast centroids,
    # and a cache here would leak storage memory per invocation (the caller
    # can't unpersist a lazily-returned DataFrame's lineage)
    assigned = ivf_assign(emb, centroids, id_col, vec_col)

    # per-query probe list: top-nprobe centroids by cosine
    v = F.col(vec_col)
    sims = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(x) for x in c])
        sims.append(F.struct(
            (_dot(v, carr) / (_norm(v) * _norm(carr))).alias("s"),
            F.lit(i).alias("i")))
    probes = F.slice(F.reverse(F.array_sort(F.array(*sims))), 1, nprobe)
    q = (
        assigned.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"),
                v.alias("qv"),
                F.explode(F.transform(probes, lambda p: p["i"]))
                .alias("probe"))
    )
    c = assigned.select(F.col("vec_id").alias("neighbor_id"),
                        F.col(vec_col).alias("cv"),
                        F.col("centroid").alias("cb"))
    joined = F.broadcast(q).join(c, F.col("probe") == F.col("cb")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = (_dot(F.col("qv"), F.col("cv"))
           / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    scored = joined.select("query_id", "neighbor_id", sim.alias("sim")) \
        .dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
