"""Distributed PCA over ``array<float>`` embedding columns — the
dimensionality-reduction preprocessing of a scale similarity-search
pipeline (reduce d before LSH/IVF indexing; whiten before cosine).

Reference parity note: the reference (src/mr/CountReference.java) has
no linear-algebra surface at all; this is north-star ⊕ territory
(SURVEY.md §2 extension rows, "similarity search").

Scale shape (the 100 TB story):

* ONE corpus-sized pass: Arrow-batched ``mapInPandas`` reduces each
  batch to its second/first/zeroth moments — a d×d BLAS gram ``XᵀX``
  (upper triangle), the d per-dimension sums, and the row count —
  emitted as d(d+1)/2 + d + 1 tiny rows per batch. This is the
  map-side combine of classic distributed PCA: each executor reduces
  its split to a d×d matrix before anything crosses the network, so
  the shuffle carries partial moment rows, never vectors.
* The aggregated moments frame (≤ d(d+1)/2 + d + 1 rows regardless of
  corpus size) is lazily ``localCheckpoint``-ed: Spark has no
  cross-branch common-subplan elimination (see TUNING.md, ann_ivf),
  so without it every consumer branch (means, covariance, both power
  rounds) would re-run the corpus gram.
* Everything downstream operates on that model frame; the per-vector
  projection broadcasts two d-length arrays and is a pure map stage —
  zero shuffle, same plan class as ann_cosine_topk.

Determinism discipline (what makes even PCA oracle-exact): every value
derived from a corpus-sized sum is rounded before use — covariance
cells at 6 dp, means/sigmas at 9 dp. Cross-engine summation-order
drift is ~1e-13 absolute on O(1)-magnitude sums, i.e. ~5,000× smaller
than even the 9-dp half-grid (5e-10), so a rounded digit flips only
if a true value lands within that sliver of a boundary — the same
risk class every rounded-float oracle in this catalog carries. All
model-frame intermediates (matvec results, norms, normalized eigvec
components) are ALSO rounded at 9 dp on both engines, so downstream
arithmetic runs on identical operands; signed zeros are canonicalized
(+0.0) on output columns, and the final projection uses the
sequential left-to-right double dot product (functions/vectors.py ↔
DuckDB list_dot_product) on identical rounded inputs. Power iteration
from the ALL-ONES start vector is replayable arithmetic (numpy eig
would not be); ones rather than 1/√d because the first matvec then
sums 9-dp-rounded cells unscaled — sums land ON the 1e-9 rounding
grid, never on its .5 halfway points. A dyadic scale like 1/8 puts
~1/8 of the deflated-matrix matvec sums EXACTLY on a halfway point,
where the two engines' last-ulp difference flips the rounded digit
(observed, round 7); normalization follows immediately, so the start
scale is free.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V

DIM = 64  #: embedding dimensionality of the driver testdata
POWER_ITERS = 2  #: fixed, oracle-unrolled power-iteration rounds


def _moment_partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Per-Arrow-batch moment rows: (i≥1, j≥i, Σxᵢxⱼ) upper-triangle
    gram via one BLAS matmul, (i≥1, 0, Σxᵢ) dimension sums, (0, 0, n)
    row count. Output size per batch is d(d+1)/2 + d + 1 regardless of
    batch row count — the map-side combine."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if pdf.empty:
            continue
        x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        d = x.shape[1]
        if d != DIM:
            raise ValueError(
                f"embedding dim {d} != {DIM}: the range(1, 65) oracle "
                "CTEs are written for d = 64"
            )
        g = x.T @ x
        iu = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [iu[0] + 1, np.arange(1, d + 1), [0]]
                ).astype("int32"),
                "j": np.concatenate(
                    [iu[1] + 1, np.zeros(d, dtype=np.int64), [0]]
                ).astype("int32"),
                "s": np.concatenate([g[iu[0], iu[1]], x.sum(axis=0), [len(x)]]),
            }
        )


def moments(emb: DataFrame, checkpoint: bool = True) -> DataFrame:
    """Aggregated moments frame (i, j, s) — the single corpus pass.
    Lazily checkpointed (and coalesced: ≤ 2,145 rows at d = 64 — full
    shuffle parallelism would be pure scheduler overhead, the
    connected-components lesson) so multi-consumer plans run the gram
    once. ``checkpoint=False`` exposes the raw lineage (plan gates)."""
    v = V.as_double(F.col("embedding"))
    part = emb.select(v.alias("v")).mapInPandas(
        _moment_partials, schema="i int, j int, s double"
    )
    agg = part.groupBy("i", "j").agg(F.sum("s").alias("s")).coalesce(1)
    return agg.localCheckpoint(eager=False) if checkpoint else agg


def dim_means(mom: DataFrame) -> DataFrame:
    """(i, mu, n) per dimension from the moments frame, mu rounded 9 dp."""
    n = mom.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("s").cast("long").alias("n")
    )
    return (
        mom.filter((F.col("j") == 0) & (F.col("i") > 0))
        .crossJoin(F.broadcast(n))
        .select("i", F.round(F.col("s") / F.col("n"), 9).alias("mu"), "n")
    )


def covariance_upper(emb: DataFrame, mom: DataFrame | None = None) -> DataFrame:
    """Upper-triangle covariance matrix as (i, j, cov) rows, i ≤ j,
    cov = Σxᵢxⱼ/n − μᵢμⱼ rounded 6 dp (signed zero canonicalized)."""
    if mom is None:
        mom = moments(emb)
    sums = mom.filter(F.col("j") > 0)
    m = dim_means(mom)
    mi = m.select("i", F.col("mu").alias("mu_i"), "n")
    mj = m.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    return (
        sums.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            # + 0.0 canonicalizes IEEE signed zero (round() yields -0.0
            # for tiny negatives; the value-hash would see "-0.0" ≠ "0.0")
            (
                F.round(
                    F.col("s") / F.col("n") - F.col("mu_i") * F.col("mu_j"), 6
                )
                + 0.0
            ).alias("cov"),
        )
    )


def _mirror(cov_upper: DataFrame) -> DataFrame:
    """Full d×d matrix frame from the upper triangle."""
    lower = cov_upper.filter(F.col("i") < F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "cov"
    )
    return cov_upper.union(lower)


def top_component(cov_upper: DataFrame) -> DataFrame:
    """Leading-eigenvector estimate (i, w) via POWER_ITERS fixed
    power-iteration rounds on the model frame (d = 64 is enforced on
    the data inside _moment_partials): each matvec and norm is rounded
    at 9 dp so the unrolled oracle replays bit-identically. All frames
    here are ≤ d² rows — driver-scale math kept lazy/distributed so
    the plan stays one DAG (no collect)."""
    return _power_rounds(_mirror(cov_upper))


def _matvec(full: DataFrame, vec: DataFrame | None, out: str = "w") -> DataFrame:
    """(i, out) = round(C·v, 9) over a full mirrored matrix frame;
    ``vec=None`` means the all-ones start vector (see module
    docstring for why ones, not 1/√d)."""
    if vec is None:
        return full.groupBy("i").agg(F.round(F.sum(F.col("cov")), 9).alias(out))
    return (
        full.join(F.broadcast(vec.select(F.col("i").alias("j"), "w")), "j")
        .groupBy("i")
        .agg(F.round(F.sum(F.col("cov") * F.col("w")), 9).alias(out))
    )


def _power_rounds(full: DataFrame) -> DataFrame:
    """POWER_ITERS rounds of (matvec → normalize) on a full mirrored
    (i, j, cov) matrix frame, every intermediate rounded at 9 dp."""
    vec = None
    for _ in range(POWER_ITERS):
        raw = _matvec(full, vec)
        nrm = raw.agg(F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), 9).alias("nrm"))
        vec = raw.crossJoin(F.broadcast(nrm)).select(
            "i", F.round(F.col("w") / F.col("nrm"), 9).alias("w")
        )
        # truncate lineage per round (64-row frame): each iterate feeds
        # the matvec AND the norm branch, so the un-checkpointed plan
        # doubles per round — the iterative-loop lesson from TUNING.md
        vec = vec.coalesce(1).localCheckpoint(eager=False)
    return vec


def top_two_components(cov_upper: DataFrame) -> tuple[DataFrame, DataFrame]:
    """First two principal directions via Hotelling DEFLATION — the
    general k-component path: run the power rounds for v₁, estimate
    its Rayleigh quotient λ₁ = v₁ᵀCv₁ (matvec then dot, both rounded
    9 dp), deflate C₂ = C − λ₁v₁v₁ᵀ cell-wise (a pure per-cell
    expression on already-rounded operands — bit-identical across
    engines, no summation), and run the same power rounds on C₂.
    Returns (v1, v2) as (i, w) frames. The mirrored matrix is
    checkpointed once and feeds both eigensolves."""
    full = _mirror(cov_upper).coalesce(1).localCheckpoint(eager=False)
    v1 = _power_rounds(full)
    t = _matvec(full, v1, out="t")
    lam = t.join(F.broadcast(v1), "i").agg(
        F.round(F.sum(F.col("t") * F.col("w")), 9).alias("lam")
    )
    wi = v1.select("i", F.col("w").alias("w_i"))
    wj = v1.select(F.col("i").alias("j"), F.col("w").alias("w_j"))
    full2 = (
        full.join(F.broadcast(wi), "i")
        .join(F.broadcast(wj), "j")
        .crossJoin(F.broadcast(lam))
        .select(
            "i",
            "j",
            F.round(
                F.col("cov") - F.col("lam") * F.col("w_i") * F.col("w_j"), 9
            ).alias("cov"),
        )
        .coalesce(1)
        .localCheckpoint(eager=False)
    )
    return v1, _power_rounds(full2)


def _project_onto(
    emb: DataFrame, mom: DataFrame, comps: list[tuple[str, DataFrame]]
) -> DataFrame:
    """Shared projection map: for each (out_name, (i, w) direction),
    emit round(x·v − μ·v, 6) per vector. One 1-row model frame carries
    every direction array and its centering constant; the corpus stage
    is a single broadcast + map regardless of component count."""
    model = _as_array(dim_means(mom), "i", "mu").select(F.col("arr").alias("muv"))
    for name, vec in comps:
        model = model.crossJoin(
            _as_array(vec, "i", "w").select(F.col("arr").alias(f"pc_{name}"))
        )
    model = model.select(
        *[f"pc_{name}" for name, _ in comps],
        *[
            F.round(V.dot(F.col("muv"), F.col(f"pc_{name}")), 9).alias(f"c_{name}")
            for name, _ in comps
        ],
    )
    v = V.as_double(F.col("embedding"))
    return (
        emb.select("vec_id", v.alias("v"))
        .crossJoin(F.broadcast(model))
        .select(
            "vec_id",
            *[
                (
                    F.round(
                        V.dot(F.col("v"), F.col(f"pc_{name}")) - F.col(f"c_{name}"), 6
                    )
                    + 0.0
                ).alias(name)
                for name, _ in comps
            ],
        )
    )


def project_top_two(emb: DataFrame) -> DataFrame:
    """Per-vector 2-D projection onto the mean-centered first two
    principal directions — d → d′ = 2 dimensionality reduction, the
    plural-component form of project_top_component (same broadcast-
    model map; one gram pass feeds everything)."""
    mom = moments(emb)
    v1, v2 = top_two_components(covariance_upper(emb, mom))
    return _project_onto(emb, mom, [("p1", v1), ("p2", v2)])


def _as_array(frame: DataFrame, key: str, val: str) -> DataFrame:
    """Tiny (key, val) frame → 1-row frame holding the val array in key
    order (the collect_list/array_sort idiom; stays lazy, broadcasts)."""
    return frame.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(key, val))),
            lambda s: s.getField(val),
        ).alias("arr")
    )


def diag_whitening_stats(mom: DataFrame) -> DataFrame:
    """(i, mu, sigma) per dimension from the moments frame — the
    diagonal-whitening model (σᵢ = √(Σxᵢ²/n − μᵢ²), population form,
    rounded 9 dp). Precondition: no zero-variance dimension (holds
    for real embedding corpora). A degenerate dim FAILS LOUDLY rather
    than diverging quietly: Spark's default ANSI mode raises
    DIVIDE_BY_ZERO on the σ division while DuckDB would return inf —
    an intentional crash-don't-drift posture."""
    m = dim_means(mom)
    sq = mom.filter((F.col("j") > 0) & (F.col("i") == F.col("j"))).select(
        "i", F.col("s").alias("sii")
    )
    return (
        sq.join(F.broadcast(m), "i")
        .select(
            "i",
            "mu",
            F.round(
                F.sqrt(F.col("sii") / F.col("n") - F.col("mu") * F.col("mu")), 9
            ).alias("sigma"),
        )
    )


def outlier_scores(emb: DataFrame) -> DataFrame:
    """Per-vector diagonal Mahalanobis distance — the embedding-space
    OUTLIER score a curation pipeline thresholds to drop corrupt /
    out-of-distribution vectors before they poison dedup clusters or
    ANN recall: score = ‖(x − μ) ⊘ σ‖₂ (z-score each dimension against
    corpus statistics, take the L2 norm). One moments pass builds the
    (μ, σ) model; scoring is a broadcast of two d-length arrays + a
    pure map — zero corpus shuffle beyond the d² partial sums."""
    mom = moments(emb)
    stats = diag_whitening_stats(mom)
    model = (
        _as_array(stats, "i", "mu")
        .select(F.col("arr").alias("muv"))
        .crossJoin(_as_array(stats, "i", "sigma").select(F.col("arr").alias("sig")))
    )
    v = V.as_double(F.col("embedding"))
    w = F.zip_with(
        F.zip_with(F.col("v"), F.col("muv"), lambda x, m: x - m),
        F.col("sig"),
        lambda c, s: c / s,
    )
    return (
        emb.select("vec_id", v.alias("v"))
        .crossJoin(F.broadcast(model))
        .select("vec_id", w.alias("w"))
        .select(
            "vec_id",
            (F.round(F.sqrt(V.dot(F.col("w"), F.col("w"))), 6) + 0.0).alias(
                "maha"
            ),
        )
    )


def project_top_component(emb: DataFrame) -> DataFrame:
    """Per-vector scalar projection onto the mean-centered leading
    principal component: proj = x·v − μ·v (the second term is one
    shared constant, so centering never touches the corpus pass).
    The checkpointed moments frame feeds both the eigenvector and the
    centering constant — ONE gram pass total; the corpus-sized stage
    is a broadcast of two d-length arrays + a pure map."""
    mom = moments(emb)
    v1 = top_component(covariance_upper(emb, mom))
    return _project_onto(emb, mom, [("proj", v1)])
