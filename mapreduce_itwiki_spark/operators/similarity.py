"""Similarity search over ``array<float>`` embedding columns
(north-star ⊕, SURVEY.md §2).

Two tiers:
* ``cosine_topk`` — brute-force exact top-k: broadcast the query vector,
  one map stage over the corpus (no shuffle), ``orderBy().limit(k)``
  which Spark executes as TakeOrderedAndProject (per-partition heaps +
  driver merge, never a full sort). This is the exactness baseline and
  is the right plan even at scale when k is small.
* ``lsh_bucket_topk`` — random-hyperplane LSH: B sign-bits bucket the
  corpus; only the query's bucket is scanned. Hyperplanes are
  INTEGER-valued pseudo-random vectors (h_j[i] = ((37·i + 101·j) mod 19) − 9)
  so the bucketing is exactly reproducible in any engine (no libm
  drift) — the DuckDB oracle replays identical buckets, making even this
  approximate operator hash-checkable. At 100 TB, bucket the corpus
  ONCE (write bucketed/partitioned by bucket id), then each query scans
  ~1/2^B of the data; multi-probe = enumerate Hamming-1 neighbor buckets.

All arithmetic is double-precision, sequential left-to-right
(functions/vectors.py), matching the oracle's ``list_dot_product`` on
``DOUBLE[]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vectors

NUM_HYPERPLANES = 4


def hyperplane(j: int, dim: int = 64) -> list[int]:
    """Deterministic integer hyperplane j (engine-portable)."""
    return [((37 * i + 101 * j) % 19) - 9 for i in range(dim)]


def bucket_bits(vec: Column, dim: int = 64, n_planes: int = NUM_HYPERPLANES) -> Column:
    """LSH bucket id as an n_planes-char '0'/'1' string of sign bits."""
    v = vectors.as_double(vec)
    bits = []
    for j in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in hyperplane(j, dim)])
        bits.append(F.when(vectors.dot(v, h) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def with_cosine_to_query(emb: DataFrame, query: DataFrame) -> DataFrame:
    """Attach cosine(embedding, query) — broadcast nested-loop join with a
    1-row build side, i.e. a pure map stage."""
    q = query.select(vectors.as_double(F.col("embedding")).alias("qv"))
    return emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id"),
        F.col("label"),
        F.round(vectors.cosine(vectors.as_double(F.col("embedding")), F.col("qv")), 6).alias("cosine"),
    )


def cosine_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact brute-force top-k by cosine to the query vector.

    Deterministic under ties: ordered by (cosine desc, vec_id). The query
    vector itself is excluded."""
    query = emb.filter(F.col("vec_id") == query_vec_id)
    scored = with_cosine_to_query(emb.filter(F.col("vec_id") != query_vec_id), query)
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def bucketed_neardup_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket the corpus, then
    bucket-local pairwise cosine with numpy (Arrow-batched applyInPandas).

    This is the IVF shape: the docs² problem becomes Σ bucket², and each
    bucket's matmul is vectorized C, not per-row Python. Approximate by
    construction (pairs straddling a hyperplane are missed); the oracle
    replays the identical integer-hyperplane bucketing, so the output is
    still exactly reproducible. At 100 TB: persist bucketed/partitioned
    by bucket id, cap bucket sizes (re-split hot buckets with more
    planes), and let AQE skew-split the groupBy."""
    import numpy as np
    import pandas as pd

    bucketed = emb.select(
        F.col("vec_id"), F.col("embedding"), bucket_bits(F.col("embedding")).alias("bucket")
    )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        norms = np.sqrt((m * m).sum(axis=1))
        cos = (m @ m.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(ids), k=1)
        keep = cos[iu] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[iu[0][keep]],
                "vec_b": ids[iu[1][keep]],
                "cosine": np.round(cos[iu][keep], 6),
            }
        )

    return bucketed.groupBy("bucket").applyInPandas(
        per_bucket, "vec_a long, vec_b long, cosine double"
    )


def lsh_bucket_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """ANN top-k: scan only the query's LSH bucket, then exact cosine.

    Approximate by design (recall < 1 when true neighbors land across a
    hyperplane); deterministic and oracle-reproducible by construction."""
    bucketed = emb.withColumn("bucket", bucket_bits(F.col("embedding")))
    query = bucketed.filter(F.col("vec_id") == query_vec_id)
    same_bucket = (
        bucketed.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(query.select(F.col("bucket"))), "bucket")
    )
    scored = with_cosine_to_query(same_bucket, query)
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)
