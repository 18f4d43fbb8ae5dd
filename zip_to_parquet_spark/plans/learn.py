"""Learned-model pipeline queries: distributed clustering, trained
classification, data-layout optimization.

The round-5 additions to the LLM-pipeline surface (BASELINE.json north
star; no counterpart in the 597-line reference CLI, SURVEY §0): the
operators a training-data pipeline runs once corpora outgrow heuristics —
full-corpus k-means (the SemDeDup / topic-stratification substrate), a
trained hashed-feature linear classifier (the fastText-style model-based
filter), and multi-dimensional layout clustering for scan pruning.

Oracle discipline matches the iterative keys from round 4
(``graph_pagerank_nations``): everything is exact integer arithmetic, so
DuckDB replays the full fixed point — including every Lloyd's iteration —
with no float seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zip_to_parquet_spark.operators.vectors import kmeans_integer
from zip_to_parquet_spark.plans.registry import query
from zip_to_parquet_spark.schema import load_table

# ---------------------------------------------------------------------------
# Full-corpus k-means over embeddings (exact integer Lloyd's)
# ---------------------------------------------------------------------------
_KM_K = 8
_KM_ITERS = 3
_KM_SCALE = 1_000_000
_KM_OFFSET = 4_000_000


def _kmeans_oracle() -> str:
    """Unrolled-CTE replay of every Lloyd's iteration (same pattern as the
    PageRank oracle's unrolled power steps) — exact integer parity for the
    whole fixed point, not just the final assignment."""
    ctes = [
        f"""x AS (
  SELECT vec_id,
         list_transform(embedding,
           e -> CAST(floor(CAST(e AS DOUBLE) * {_KM_SCALE}) AS BIGINT)
                + {_KM_OFFSET}) AS xm
  FROM embeddings
)""",
        """xd AS (
  SELECT vec_id, unnest(xm) AS v, generate_subscripts(xm, 1) AS i FROM x
)""",
        f"""init AS (
  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cl, xm
  FROM (SELECT vec_id, xm FROM x ORDER BY vec_id LIMIT {_KM_K})
)""",
        """c0 AS (
  SELECT cl, unnest(xm) AS v, generate_subscripts(xm, 1) AS i FROM init
)""",
    ]
    for t in range(1, _KM_ITERS + 1):
        p = t - 1
        ctes.append(f"""d{t} AS (
  SELECT xd.vec_id, c.cl, sum((xd.v - c.v) * (xd.v - c.v)) AS d2
  FROM xd JOIN c{p} c USING (i)
  GROUP BY 1, 2
)""")
        ctes.append(f"""a{t} AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
    FROM d{t}
  ) WHERE rn = 1
)""")
        ctes.append(f"""s{t} AS (
  SELECT a.cl, xd.i, sum(xd.v) AS s, count(*) AS cnt
  FROM a{t} a JOIN xd ON a.vec_id = xd.vec_id
  GROUP BY 1, 2
)""")
        ctes.append(f"""c{t} AS (
  SELECT p.cl, p.i, coalesce(s.s // s.cnt, p.v) AS v
  FROM c{p} p LEFT JOIN s{t} s ON s.cl = p.cl AND s.i = p.i
)""")
    ctes.append(f"""df AS (
  SELECT xd.vec_id, c.cl, sum((xd.v - c.v) * (xd.v - c.v)) AS d2
  FROM xd JOIN c{_KM_ITERS} c USING (i)
  GROUP BY 1, 2
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT vec_id, cl AS cluster, d2 AS dist2 FROM (
  SELECT vec_id, cl, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
  FROM df
) WHERE rn = 1
"""
    )


@query("cluster_kmeans_embeddings", oracle=_kmeans_oracle())
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus k-means (k=8, 3 Lloyd's iterations) over the embeddings
    table in exact integer micro-units → (vec_id, cluster, dist2).

    Engine: operators.vectors.kmeans_integer — broadcast centroids,
    map-side assignment, one (cluster, dim) aggregate per iteration,
    localCheckpoint between steps. Oracle: the SAME fixed point via
    unrolled CTEs, one set per iteration — bit-identical because every
    step (quantize, distance, argmin tie-break, floor-division mean,
    empty-cluster fallback) is integer-exact in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_integer(
        emb,
        k=_KM_K,
        iters=_KM_ITERS,
        scale=_KM_SCALE,
        offset=_KM_OFFSET,
    )
