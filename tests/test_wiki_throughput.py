"""Throughput smoke on the reference's OWN workload shape: a ~30 MB
MediaWiki dump through the full pipeline (XML scan → parse → extract →
normalize → dedup → count → sort). The reference ran this workload as
two Hadoop jobs with an FS round-trip and a single reducer; this is the
one-DAG Spark path. No golden baseline exists (BASELINE.md: the
reference published no timings), so the assertion is a generous
sanity ceiling — the printed MB/s is the informative part."""

from __future__ import annotations

import time

from mapreduce_itwiki_spark.operators import linkgraph
from mapreduce_itwiki_spark.sources import xml_pages

import wiki_fixture


def test_wiki_pipeline_throughput(spark, tmp_path):
    blocks = []
    for rep in range(3600):
        for i, (title, text) in enumerate(wiki_fixture.PAGES):
            blocks.append(
                f"<page><title>{title} v{rep}</title><ns>0</ns><id>{rep * 10 + i}</id>"
                f"<revision><text>{text.replace('&', '&amp;')}</text></revision></page>"
            )
    doc = "<mediawiki>\n" + "\n".join(blocks) + "\n</mediawiki>\n"
    p = tmp_path / "dump.xml"
    p.write_text(doc, encoding="utf-8")
    size_mb = p.stat().st_size / 1e6

    t0 = time.perf_counter()
    with xml_pages.scoped_max_split_bytes(spark, 4 * 1024 * 1024):
        pages = xml_pages.read_pages(spark, str(p))
        result = linkgraph.incoming_reference_counts(pages)
        n_rows = result.count()
    dt = time.perf_counter() - t0

    # the distinct targets are rep-invariant; every sim target present
    _, per_rep = wiki_fixture.simulate()
    assert n_rows == len(per_rep)
    print(f"\nwiki pipeline: {size_mb:.1f} MB in {dt:.1f}s = {size_mb / dt:.1f} MB/s")
    assert dt < 120, f"pipeline took {dt:.0f}s for {size_mb:.0f} MB"
