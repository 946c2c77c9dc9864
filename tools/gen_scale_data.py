"""Scale-factor testdata generator for the soak runs (VERDICT r3 ask #1).

The driver's testdata stops at sf0.1 (~600 k lineitem rows); every
scale claim in TUNING.md above that is argued from plans. This tool
generates schema-compatible tables at arbitrary sf so the claims can be
OBSERVED: same columns/types/value ranges/correlations as
/root/testdata (reverse-engineered in-round: vocab, date spans, key
fan-outs, planted near-dups), plus deliberately planted SKEW — a hot
customer (1% of orders), a hot part (2% of lineitems), a hot event user
(1%) — so AQE skew-splitting and salting actually fire at soak scale.

Everything is a deterministic function of (table, id) via xxhash64 —
fully distributed generation, no RNG state, no driver loops; a given
(sf, id) always produces the same row.

Usage: python tools/gen_scale_data.py SF OUT_DIR [--tables=t1,t2] [--vocab=dense|zipf]
  e.g. python tools/gen_scale_data.py 5 /root/repo/.scale/sf5
       python tools/gen_scale_data.py 5 /root/repo/.scale/sf5z --tables=documents --vocab=zipf
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_itwiki_spark.session import get_spark  # noqa: E402

VOCAB = (
    "the sort value hash filter big dup part scan slow agg key window table "
    "merge join query row stream line small group spark fast customer batch "
    "data column order a vector"
).split()

#: zipf-mode vocabulary size. The 31-word VOCAB above makes every
#: 3-gram shingle near-universal (DF ≈ docs/vocab³·L — measured ~2,400
#: at sf5) — the exact OPPOSITE of real text, where shingle DF is
#: zipf-distributed with a long DF=1 tail. r4's soak numbers therefore
#: measured a pathological corpus (VERDICT r4 #2). --vocab=zipf draws
#: words "w<rank>" with rank = floor(V^u) (inverse-CDF of zipf s=1:
#: P(rank=r) ∝ ln(1+1/r) ≈ 1/r), giving a realistic head ("w1" in
#: nearly every doc, like "the") and tail (most types appear once).
ZIPF_VOCAB = 50_000

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["HOUSEHOLD", "AUTOMOBILE", "FURNITURE", "BUILDING", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "en", "en", "en", "zh", "de", "fr", "es"]  # en-heavy mix
PART_ADJ = ["large", "hot", "small", "cold", "dim", "bright", "heavy", "light"]
PART_NOUN = ["ring", "bolt", "gear", "cog", "pin", "rod", "cap", "nut"]
PART_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]


def h(seed: int, col: str = "id") -> F.Column:
    return F.abs(F.xxhash64(F.col(col), F.lit(seed)))


def u(seed: int, col: str = "id") -> F.Column:
    """Deterministic uniform [0, 1)."""
    return (h(seed, col) % 1_000_000) / 1_000_000.0


def pick(options: list[str], seed: int, col: str = "id") -> F.Column:
    return F.element_at(
        F.array(*[F.lit(o) for o in options]), (h(seed, col) % len(options) + 1).cast("int")
    )


def zipf_word(hash_col: F.Column) -> F.Column:
    """Deterministic zipf(s≈1) word from a 64-bit hash: rank =
    floor(V^u)+0 clamped to [1, V], word = 'w<rank>'."""
    uu = (hash_col % 1_000_000) / 1_000_000.0
    import math

    rank = F.least(
        F.lit(ZIPF_VOCAB), F.floor(F.exp(uu * math.log(ZIPF_VOCAB))).cast("long")
    )
    return F.concat(F.lit("w"), F.greatest(rank, F.lit(1)).cast("string"))


def gen(
    sf: float, out: str, tables: set[str] | None = None, vocab: str = "dense"
) -> None:
    spark = get_spark("gen_scale_data")
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)
    n_users = int(15_000 * sf)
    parts_out = max(8, min(64, int(32 * sf / 2)))

    def want(t: str) -> bool:
        return tables is None or t in tables

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"wrote {name}")

    if want("region"):
        write(
            spark.createDataFrame(
                [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey int, r_name string"
            ),
            "region",
        )
    if want("nation"):
        write(
            spark.createDataFrame(
                [(i, f"NATION_{i}", i % 5) for i in range(25)],
                "n_nationkey int, n_name string, n_regionkey int",
            ),
            "nation",
        )
    if want("customer"):
        write(
            spark.range(n_cust, numPartitions=parts_out).select(
                F.col("id").alias("c_custkey"),
                F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
                (h(1) % 25).cast("int").alias("c_nationkey"),
                F.round(u(2) * 11_000.0 - 1_000.0, 2).alias("c_acctbal"),
                pick(SEGMENTS, 3).alias("c_mktsegment"),
            ),
            "customer",
        )
    if want("supplier"):
        write(
            spark.range(n_supp, numPartitions=parts_out).select(
                F.col("id").alias("s_suppkey"),
                F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
                (h(4) % 25).cast("int").alias("s_nationkey"),
                F.round(u(5) * 11_000.0 - 1_000.0, 2).alias("s_acctbal"),
            ),
            "supplier",
        )
    if want("part"):
        write(
            spark.range(n_part, numPartitions=parts_out).select(
                F.col("id").alias("p_partkey"),
                F.concat(pick(PART_ADJ, 6), F.lit(" "), pick(PART_NOUN, 7)).alias("p_name"),
                F.concat(F.lit("Brand#"), (h(8) % 25 + 1).cast("string")).alias("p_brand"),
                pick(PART_TYPES, 9).alias("p_type"),
                (h(10) % 50 + 1).cast("int").alias("p_size"),
                F.round(F.lit(900.0) + (h(11) % 1_000) / 10.0, 2).alias("p_retailprice"),
            ),
            "part",
        )
    if want("orders"):
        # skew plant: ~1% of orders land on customer 42
        custkey = F.when(h(12) % 100 == 0, F.lit(42)).otherwise(h(13) % n_cust)
        odate = F.timestamp_add(
            "DAY", (h(14) % 2405).cast("int"), F.lit("1995-01-01").cast("timestamp")
        )
        write(
            spark.range(n_orders, numPartitions=parts_out).select(
                F.col("id").alias("o_orderkey"),
                custkey.cast("long").alias("o_custkey"),
                pick(["F", "O", "P"], 15).alias("o_orderstatus"),
                F.round(u(16) * 400_000.0 + 1_000.0, 2).alias("o_totalprice"),
                odate.alias("o_orderdate"),
                pick(PRIORITIES, 17).alias("o_orderpriority"),
            ),
            "orders",
        )
    if want("lineitem"):
        # ~4 lines per order (1..7); a hot part takes ~2% of lines
        lines = spark.range(n_orders, numPartitions=parts_out).select(
            F.col("id").alias("l_orderkey"),
            F.explode(F.sequence(F.lit(1), (h(18) % 7 + 1).cast("int"))).alias(
                "l_linenumber"
            ),
        )
        lh = F.abs(F.xxhash64("l_orderkey", "l_linenumber", F.lit(19)))
        partkey = F.when(lh % 50 == 0, F.lit(7)).otherwise(
            F.abs(F.xxhash64("l_orderkey", "l_linenumber", F.lit(20))) % n_part
        )
        qty = (lh % 50 + 1).cast("double")
        price = F.round(qty * (900.0 + (lh % 1_000) / 10.0), 2)
        sdate = F.timestamp_add(
            "DAY",
            (F.abs(F.xxhash64("l_orderkey", "l_linenumber", F.lit(21))) % 2500).cast(
                "int"
            ),
            F.lit("1995-01-02").cast("timestamp"),
        )
        write(
            lines.select(
                "l_orderkey",
                partkey.cast("long").alias("l_partkey"),
                (F.abs(F.xxhash64("l_orderkey", "l_linenumber", F.lit(22))) % n_supp)
                .cast("long")
                .alias("l_suppkey"),
                "l_linenumber",
                qty.alias("l_quantity"),
                price.alias("l_extendedprice"),
                ((lh % 11) / 100.0).alias("l_discount"),
                ((lh % 9) / 100.0).alias("l_tax"),
                pick(["A", "N", "R"], 23, "l_orderkey").alias("l_returnflag"),
                pick(["F", "O"], 24, "l_orderkey").alias("l_linestatus"),
                sdate.alias("l_shipdate"),
            ),
            "lineitem",
        )
    if want("events"):
        # hot user 7 takes ~1% of events; ts spans 2024-01 like the driver's
        user = F.when(h(25) % 100 == 0, F.lit(7)).otherwise(h(26) % n_users)
        ts = F.timestamp_add(
            "SECOND",
            (h(27) % (30 * 86_400)).cast("int"),
            F.lit("2024-01-01").cast("timestamp"),
        )
        write(
            spark.range(n_events, numPartitions=parts_out).select(
                F.col("id").alias("event_id"),
                ts.alias("ts"),
                user.cast("long").alias("user_id"),
                pick(EVENT_TYPES, 28).alias("event_type"),
                F.round(u(29) * 200.0, 2).alias("value"),
                F.format_string('{"k": %d}', (h(30) % 100).cast("int")).alias("props"),
            ),
            "events",
        )
    if want("documents"):
        # ~6% planted near-dups: content re-derived from an EARLIER doc
        # plus a 3-word mutation → Jaccard well above 0.5 but not 1.0
        base = F.col("id")
        planted = (F.col("id") % 17 == 13) & (F.col("id") >= 100)
        content = F.when(
            planted, F.greatest(base - (h(31) % 997) - 1, F.lit(0))
        ).otherwise(base)
        n_words = (F.abs(F.xxhash64(content, F.lit(32))) % 568 + 10).cast("int")
        if vocab == "zipf":
            words = F.transform(
                F.sequence(F.lit(1), n_words),
                lambda i: zipf_word(F.abs(F.xxhash64(content, i, F.lit(33)))),
            )
            mutation = F.when(
                planted,
                F.concat(
                    F.lit(" "),
                    zipf_word(h(34)),
                    F.lit(" "),
                    zipf_word(h(35)),
                    F.lit(" "),
                    zipf_word(h(36)),
                ),
            ).otherwise(F.lit(""))
        else:
            vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
            words = F.transform(
                F.sequence(F.lit(1), n_words),
                lambda i: F.element_at(
                    vocab_arr,
                    (F.abs(F.xxhash64(content, i, F.lit(33))) % len(VOCAB) + 1).cast(
                        "int"
                    ),
                ),
            )
            mutation = F.when(
                planted,
                F.concat(
                    F.lit(" "),
                    pick(VOCAB, 34),
                    F.lit(" "),
                    pick(VOCAB, 35),
                    F.lit(" "),
                    pick(VOCAB, 36),
                ),
            ).otherwise(F.lit(""))
        text = F.concat(F.array_join(words, " "), mutation)
        write(
            spark.range(n_docs, numPartitions=parts_out).select(
                F.col("id").alias("doc_id"),
                text.alias("text"),
                pick(LANGS, 37).alias("lang"),
                F.format_string("src%d", (h(38) % 20).cast("int")).alias("source"),
                F.length(text).cast("long").alias("n_chars"),
            ),
            "documents",
        )
    if want("embeddings"):
        label = (h(39) % 10).cast("int")
        dims = F.sequence(F.lit(0), F.lit(63))
        emb = F.transform(
            dims,
            lambda i: (
                (F.abs(F.xxhash64(label, i, F.lit(40))) % 400) / 1_000.0
                - 0.2
                + ((F.abs(F.xxhash64(F.col("id"), i, F.lit(41))) % 100) / 1_000.0 - 0.05)
            ).cast("float"),
        )
        write(
            spark.range(n_vecs, numPartitions=parts_out).select(
                F.col("id").alias("vec_id"),
                emb.alias("embedding"),
                label.alias("label"),
            ),
            "embeddings",
        )
    spark.stop()


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    tables = None
    vocab = "dense"
    for arg in sys.argv[3:]:
        if arg.startswith("--tables"):
            tables = set(arg.split("=", 1)[1].split(","))
        elif arg.startswith("--vocab"):
            vocab = arg.split("=", 1)[1]
    gen(sf, out, tables, vocab=vocab)


if __name__ == "__main__":
    main()
