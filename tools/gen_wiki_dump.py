"""Synthetic MediaWiki dump generator (VERDICT r3 ask #1, wiki half).

The reference's golden artifacts come from the full itwiki dump (~3.7 M
distinct pairs / ~1.1 M targets, /root/reference/result/ .crc sizes);
its committed sample is 10 pages. To soak the namesake pipeline at
dump scale this emits a structurally-faithful MediaWiki 0.10 export:
one <page> per article with <title>/<ns>/<id>/<revision><text>, link
markup exercising every reference quirk the engine pins — [[Target]],
[[Target|label]] pipe splits, namespace links ([[File:..]],
[[Categoria:..]]) that O5 must drop, nested [[File:..[[inner]]..]]
swallowing, repeated links from one page (O8 dedups), comma/bracket
strips (O6) — at a power-law in-link distribution (popular pages get
most incoming links, like a real wiki).

Deterministic function of page id via xxhash64; distributed generation
and write (no driver loop). ~2 KB/page → 1 M pages ≈ 2 GB.

Usage: python tools/gen_wiki_dump.py N_PAGES OUT_DIR
  e.g. python tools/gen_wiki_dump.py 1200000 /root/repo/.scale/wikidump
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_itwiki_spark.session import get_spark  # noqa: E402

FILLER = (
    "storia del la il di e per con una nel che sono stato citta regione "
    "comune provincia secolo guerra re papa arte musica film libro"
).split()


def main() -> None:
    n_pages = int(sys.argv[1])
    out = sys.argv[2]
    spark = get_spark("gen_wiki_dump")

    def h(seed, *cols):
        return F.abs(F.xxhash64(*cols, F.lit(seed)))

    pages = spark.range(n_pages, numPartitions=64)
    pid = F.col("id")

    # power-law link targets: u^4 concentrates on low page ids, so the
    # head pages collect most in-links (Zipf-ish, like a real wiki)
    n_links = (h(1, pid) % 31 + 20).cast("int")  # 20..50 links/page

    def target(i):
        uu = (h(2, pid, i) % 1_000_000) / 1_000_000.0
        tgt = F.floor(F.pow(uu, 4.0) * n_pages).cast("long")
        return F.concat(F.lit("Pagina "), tgt.cast("string"))

    def link(i):
        kind = h(3, pid, i) % 10
        t = target(i)
        return (
            F.when(kind == 0, F.concat(F.lit("[[File:Foto "), t, F.lit(".jpg]]")))
            .when(kind == 1, F.concat(F.lit("[[Categoria:"), t, F.lit("]]")))
            .when(kind == 2, F.concat(F.lit("[["), t, F.lit("|un, link]]")))
            .when(
                kind == 3,
                # nested: outer File link swallows the inner one (O3's
                # non-greedy match stops at the INNER ]])
                F.concat(F.lit("[[File:X "), t, F.lit(" [["), t, F.lit("]] fine]]")),
            )
            .otherwise(F.concat(F.lit("[["), t, F.lit("]]")))
        )

    def filler_word(i):
        arr = F.array(*[F.lit(w) for w in FILLER])
        return F.element_at(arr, (h(4, pid, i) % len(FILLER) + 1).cast("int"))

    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_links),
            lambda i: F.concat(filler_word(i), F.lit(" "), link(i), F.lit(" "), filler_word(i + 100)),
        ),
    )
    # ~150 extra filler words so pages have realistic prose mass
    prose = F.concat_ws(
        " ",
        F.transform(F.sequence(F.lit(200), F.lit(349)), filler_word),
    )
    xml = F.concat(
        F.lit("  <page>\n    <title>Pagina "),
        pid.cast("string"),
        F.lit("</title>\n    <ns>0</ns>\n    <id>"),
        (pid + 1).cast("string"),
        F.lit("</id>\n    <revision>\n      <text>"),
        body,
        F.lit(" "),
        prose,
        F.lit("</text>\n    </revision>\n  </page>"),
    )
    pages.select(xml.alias("value")).write.mode("overwrite").text(out)
    print(f"wrote {n_pages} pages to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
