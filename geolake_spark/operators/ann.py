"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force top-k per probe: broadcast the probe
  set, JVM-side dot products (zip_with/aggregate — no Python), windowed
  top-k.  The correctness baseline.
* ``ivf_topk`` — IVF-style scale path: k-means-lite centroids (driver-side
  NumPy on a sample), every vector assigned to its nearest centroid
  (Arrow UDF), probes search only ``nprobe`` nearest lists.  Approximate;
  recall measured against ``cosine_topk`` in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geolake_spark.functions import sim


def cosine_topk(vectors: DataFrame, probes: DataFrame, k: int,
                vec_col: str = "embedding", id_col: str = "vec_id",
                probe_id: str = "probe_id", probe_vec: str = "probe_vec") -> DataFrame:
    """Exact top-k by cosine per probe.  probes must be small (broadcast)."""
    j = vectors.crossJoin(F.broadcast(probes))
    cos = sim.cosine_col(F.col(vec_col), F.col(probe_vec))
    w = Window.partitionBy(probe_id).orderBy(F.col("cosine").desc(),
                                             F.col(id_col).asc())
    return (j.withColumn("cosine", F.round(cos, 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(probe_id, id_col, "cosine", "rank"))


def _kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8,
                 seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centers = sample[rng.choice(len(sample), n_clusters, replace=False)]
    for _ in range(iters):
        # cosine assignment on normalized vectors
        sims = sample @ centers.T
        assign = sims.argmax(axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    centers[c] = v / norm
    return centers


def ivf_topk(vectors: DataFrame, probes: DataFrame, k: int,
             n_clusters: int = 16, nprobe: int = 3,
             vec_col: str = "embedding", id_col: str = "vec_id",
             probe_id: str = "probe_id", probe_vec: str = "probe_vec",
             sample_rows: int = 2000, seed: int = 42) -> DataFrame:
    """IVF-bucketed approximate top-k: vectors partitioned into centroid
    lists; each probe scans only its ``nprobe`` nearest lists."""
    sample = np.array([r[0] for r in
                       vectors.select(id_col, vec_col).orderBy(id_col)
                       .limit(sample_rows).select(vec_col).collect()],
                      dtype=np.float64)  # ordered -> deterministic centroids
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    sample = sample / np.clip(norms, 1e-12, None)
    centers = _kmeans_lite(sample, n_clusters, seed=seed)

    @pandas_udf(T.IntegerType())
    def assign_udf(vec: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vec])
        m = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        return pd.Series((m @ centers.T).argmax(axis=1).astype(np.int32))

    assigned = vectors.withColumn("list_id", assign_udf(F.col(vec_col)))

    probe_rows = probes.collect()
    cand = []
    for r in probe_rows:
        pv = np.asarray(r[probe_vec], dtype=np.float64)
        pv = pv / max(np.linalg.norm(pv), 1e-12)
        lists = np.argsort(-(centers @ pv))[:nprobe]
        for li in lists:
            cand.append((r[probe_id], int(li), list(r[probe_vec])))
    spark = vectors.sparkSession
    cand_df = F.broadcast(spark.createDataFrame(
        pd.DataFrame(cand, columns=[probe_id, "list_id", probe_vec])))

    j = assigned.join(cand_df, "list_id")
    cos = sim.cosine_col(F.col(vec_col),
                         F.col(probe_vec).cast(T.ArrayType(T.DoubleType())))
    w = Window.partitionBy(probe_id).orderBy(F.col("cosine").desc(),
                                             F.col(id_col).asc())
    return (j.withColumn("cosine", F.round(cos, 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(probe_id, id_col, "cosine", "rank"))
