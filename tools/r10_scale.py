"""Round-10 scale evidence (VERDICT r9 #3/#4/#5):

* ``monitor`` — the BUDGET-TARGETED probe-coverage monitor at scale:
  wall time + derived mod of ``probe_coverage_report(query_sample_mod=
  "auto")`` vs the static-mod r9 mode, proving the monitor's cost is
  bounded by the row budget instead of ∝ batch·occupancy (the r9 weak
  flag: static mod 3 went 41.7 → 318 s on 4× data).
* ``capladder`` — the PROBE_CAP rung re-measured through the catalog
  code path (`ann_candidates_against_index(probe_cap=…, radius=1)` on
  the occupancy-bits index): ingest "found" (probe's best candidate
  ties the exact corpus nearest, rounded cosine equality) at cap 512 vs
  2048 — the 0.844-class confirmation VERDICT r9 #3 asks to pin.
* ``ivfocc`` — the IVF occupancy plan at scale: trail wall time +
  chosen nlist over a scale-appropriate grid, then the
  retrain-at-measured-nlist lifecycle with balance-report max-skew /
  max-cell / spill BEFORE (formula default) and AFTER (measured).

Usage: python tools/r10_scale.py SF_DIR OUT_JSON [steps]
  steps ⊆ {monitor,capladder,ivfocc} (default: all)
  e.g. python tools/r10_scale.py /root/repo/.scale/sf20z \
      BENCH_r10_sf20z.json monitor,capladder

SF_DIR must be a REPO-LOCAL scale dir (.scale/sf5z, .scale/sf20z):
the index artifacts are staged inside it, and /root/testdata is
read-only territory by contract.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_itwiki_spark.functions import vectors  # noqa: E402
from mapreduce_itwiki_spark.operators import similarity as S  # noqa: E402
from mapreduce_itwiki_spark.session import get_spark  # noqa: E402

STATIC_MOD = 3  #: the r9 sampled-mode constant (the A/B baseline)
LADDER_QMOD = 256  #: 1-in-256 md5 query sample ≈ 400 queries at sf20z
SCALE_NLIST_GRID = (32, 64, 128, 256)  #: nlist grid around auto_nlist
#: at the soak scales (the demo grid (4, 8, 16) is driver-scale)


def ensure_occ_index(spark, sf_dir: str, emb, s: int) -> tuple[str, int]:
    """The corpus-side occupancy-bits index (rebuilt if absent) —
    shared with tools/occupancy_scale.py's probe step."""
    chosen = S.choose_band_bits_occupancy(emb, sample_mod=8)
    path = os.path.join(sf_dir, f".occidx_bb{chosen}")
    if not os.path.exists(os.path.join(path, "_geometry", "_SUCCESS")):
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        S.ann_index_write(emb.filter(F.col("vec_id") < s), path, band_bits=chosen)
        print(f"built {path} in {round(time.time() - t0, 1)} s", flush=True)
    return path, chosen


def main() -> None:
    sf_dir, out_json = sys.argv[1], sys.argv[2]
    steps = set(
        (sys.argv[3] if len(sys.argv) > 3 else "monitor,capladder,ivfocc").split(",")
    )
    if not os.path.abspath(sf_dir).startswith("/root/repo/"):
        raise SystemExit(
            "r10_scale stages index artifacts inside SF_DIR — run it on a"
            " repo-local scale dir (.scale/sfNz), never /root/testdata"
        )
    spark = get_spark("r10_scale")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    s = 3 * (n - 1) // 4
    res: dict = {"sf_dir": sf_dir, "n": n, "split": s}
    batch = emb.filter(F.col("vec_id") >= s)

    if "monitor" in steps:
        path, chosen = ensure_occ_index(spark, sf_dir, emb, s)
        res["monitor"] = {}
        batch_n = batch.count()
        auto_mod = S.auto_probe_sample_mod(batch_n, max_bucket=S.MAX_BUCKET)
        for tag, mod in (("auto_budget", "auto"), ("static_mod3", STATIC_MOD)):
            t0 = time.time()
            rep = S.probe_coverage_report(
                spark,
                path,
                batch,
                probe_cap=S.PROBE_CAP,
                corpus_max_id=s - 1,
                query_sample_mod=mod,
            )
            agg = rep.agg(
                F.count(F.lit(1)).alias("nq"),
                F.round(F.avg("capped_fraction"), 4).alias("mean_capped"),
            ).collect()[0]
            row = {
                "mod": auto_mod if mod == "auto" else mod,
                "n_queries_sampled": agg.nq,
                "mean_capped_fraction": float(agg.mean_capped),
                "sec": round(time.time() - t0, 2),
                "budget_rows": S.MONITOR_ROW_BUDGET if mod == "auto" else None,
            }
            res["monitor"][tag] = row
            print("MONITOR", tag, json.dumps(row), flush=True)

    if "capladder" in steps:
        path, chosen = ensure_occ_index(spark, sf_dir, emb, s)
        q = batch.filter(S.sample_coin(F.col("vec_id"), LADDER_QMOD))
        qv = q.select(
            F.col("vec_id").alias("qid"),
            vectors.as_double(F.col("embedding")).alias("qv"),
        )
        exact = (
            emb.filter(F.col("vec_id") < s)
            .select("vec_id", vectors.as_double(F.col("embedding")).alias("cv"))
            .crossJoin(F.broadcast(qv))
            .select(
                "qid",
                F.round(vectors.cosine(F.col("cv"), F.col("qv")), 6).alias("c"),
            )
            .groupBy("qid")
            .agg(F.max("c").alias("exact_best"))
            .localCheckpoint()
        )
        res["capladder"] = {"band_bits": chosen, "n_queries": exact.count()}
        radii = (1, 2) if "radius2" in steps else (1,)
        for cap, radius in [(c, r) for r in radii for c in (S.PROBE_CAP, 4 * S.PROBE_CAP)]:
            t0 = time.time()
            cands = S.ann_candidates_against_index(
                spark, path, q, corpus_max_id=s - 1, probe_cap=cap, radius=radius
            )
            best = cands.groupBy("qid").agg(F.max("cosine").alias("probe_best"))
            agg = (
                exact.join(best, "qid", "left")
                .agg(
                    F.round(
                        F.avg(
                            F.when(
                                F.col("probe_best") >= F.col("exact_best"), 1
                            ).otherwise(0)
                        ),
                        4,
                    ).alias("found"),
                    F.round(F.avg(F.coalesce(F.col("probe_best"), F.lit(0.0))), 4)
                    .alias("mean_probe_best"),
                )
                .collect()[0]
            )
            row = {
                "probe_cap": cap,
                "radius": radius,
                "found": float(agg.found),
                "mean_probe_best": float(agg.mean_probe_best),
                "sec": round(time.time() - t0, 2),
            }
            res["capladder"][f"cap{cap}" + (f"_r{radius}" if radius != 1 else "")] = row
            print("CAPLADDER", json.dumps(row), flush=True)

    if "ivfocc" in steps:
        res["ivfocc"] = {}
        t0 = time.time()
        trail = {
            int(r.nlist): {
                "spill": float(r.spill_fraction),
                "max_cell": int(r.max_cell),
                "skew": float(r.skew),
                "dead": int(r.n_dead_cells),
            }
            for r in S.ivf_occupancy_trail(
                emb, nlists=SCALE_NLIST_GRID
            ).collect()
        }
        sec_trail = round(time.time() - t0, 2)
        chosen_nl = next(
            (
                w
                for w in sorted(SCALE_NLIST_GRID)
                if trail[w]["spill"] <= S.OCCUPANCY_TARGET_SPILL
            ),
            max(SCALE_NLIST_GRID),
        )
        res["ivfocc"]["trail"] = trail
        res["ivfocc"]["sec_trail"] = sec_trail
        res["ivfocc"]["chosen_nlist"] = chosen_nl
        res["ivfocc"]["formula_nlist"] = S.auto_nlist(n)
        print("IVFOCC trail", json.dumps(res["ivfocc"]), flush=True)
        # retrain-at-measured lifecycle: build at the module default
        # (the outgrown geometry), retrain remeasured, balance A/B
        path = os.path.join(sf_dir, ".ivfidx_r10meas")
        shutil.rmtree(path, ignore_errors=True)

        def balance(tag):
            rep = S.ivf_balance_report(spark, path)
            agg = rep.agg(
                F.max("n_vectors").alias("max_cell"),
                F.round(F.max("skew"), 4).alias("max_skew"),
                F.sum(
                    F.greatest(F.col("n_vectors") - S.MAX_BUCKET, F.lit(0))
                ).alias("spill_rows"),
            ).collect()[0]
            row = {
                "nlist": int(
                    spark.read.parquet(f"{path}/_meta").take(1)[0].nlist
                ),
                "max_cell": int(agg.max_cell),
                "max_skew": float(agg.max_skew),
                "spill_rows": int(agg.spill_rows),
            }
            res["ivfocc"][tag] = row
            print("IVFOCC", tag, json.dumps(row), flush=True)

        t0 = time.time()
        S.ivf_index_write(emb, path, nlist=S.IVF_NLIST)
        res["ivfocc"]["sec_build_default"] = round(time.time() - t0, 2)
        balance("before")
        t0 = time.time()
        S.ivf_index_retrain(
            spark, path, remeasure_nlist=True, nlist_grid=SCALE_NLIST_GRID
        )
        res["ivfocc"]["sec_retrain_measured"] = round(time.time() - t0, 2)
        balance("after")
        shutil.rmtree(path, ignore_errors=True)

    with open(out_json, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({"wrote": out_json}))


if __name__ == "__main__":
    main()
