"""Unit tests for operator internals not covered by the oracle harness:
multimodal Arrow plumbing, similarity determinism, sinks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_itwiki_spark.operators import dedup, multimodal, similarity
from mapreduce_itwiki_spark.sources.parquet import load_table

from conftest import SF_ORACLE, SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").limit(20)


def test_attach_blob_schema_and_bytes(spark, docs):
    blobs = multimodal.attach_blob(docs)
    assert [f.name for f in blobs.schema.fields] == ["doc_id", "blob", "meta"]
    row = blobs.filter(F.col("doc_id") == 0).collect()[0]
    assert isinstance(row.blob, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.blob)
    assert row.meta.mime == "application/octet-stream"


def test_extract_features_deterministic(spark, docs):
    feats = multimodal.extract_features(multimodal.attach_blob(docs))
    rows = {r.doc_id: r for r in feats.collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    assert set(rows) == set(src)
    for doc_id, r in rows.items():
        payload = src[doc_id].encode("utf-8")
        assert r.n_bytes == len(payload)
        assert r.feature == [float(b) for b in payload[:4]]


def test_frame_sample_fanout(spark, docs):
    frames = multimodal.frame_sample(multimodal.attach_blob(docs), every_n_bytes=64, max_frames=8)
    counts = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    src = {r.doc_id: len(r.text.encode()) for r in docs.collect()}
    for doc_id, nbytes in src.items():
        assert counts[doc_id] == min(8, max(1, nbytes // 64))
    # frame payloads are real slices
    f0 = frames.filter((F.col("doc_id") == 0) & (F.col("frame_idx") == 0)).collect()[0]
    assert len(f0.frame) <= 64


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_blob(b"\x00\x01")


def test_hyperplanes_integer_and_stable():
    h0, h1 = similarity.hyperplane(0), similarity.hyperplane(1)
    assert len(h0) == 64 and all(isinstance(x, int) for x in h0)
    assert h0 != h1
    assert similarity.hyperplane(0) == h0  # pure


def test_lsh_bucket_is_subset_of_bruteforce(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    brute = similarity.cosine_topk(emb, query_vec_id=0, k=500)
    brute_scores = {r.vec_id: r.cosine for r in brute.collect()}
    approx = similarity.lsh_bucket_topk(emb, query_vec_id=0, k=10).collect()
    assert 0 < len(approx) <= 10
    for r in approx:
        assert abs(brute_scores[r.vec_id] - r.cosine) < 1e-9


def test_ivf_full_probe_equals_bruteforce(spark):
    """IVF's only approximation is the probe restriction: with
    nprobe == nlist every inverted list is scanned, so the result must
    equal the exact brute-force top-k row for row — the index
    (centroid training + assignment) provably loses nothing."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    brute = similarity.cosine_topk(emb, query_vec_id=0, k=10).collect()
    full_probe = similarity.ivf_topk(
        emb, query_vec_id=0, k=10, nlist=similarity.IVF_NLIST, nprobe=similarity.IVF_NLIST
    ).collect()
    assert [(r.vec_id, r.cosine) for r in full_probe] == [
        (r.vec_id, r.cosine) for r in brute
    ]


def test_ivf_probe_results_are_exact_cosines(spark):
    """Precision is exact even when recall isn't: every row the probed
    IVF search returns carries the true cosine (it must appear in the
    brute-force ranking with the same score), and assignment is a
    partition — each vec_id lands in exactly one inverted list."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    brute_scores = {
        r.vec_id: r.cosine
        for r in similarity.cosine_topk(emb, query_vec_id=0, k=10**9).collect()
    }
    approx = similarity.ivf_topk(emb, query_vec_id=0, k=10).collect()
    assert 0 < len(approx) <= 10
    for r in approx:
        assert abs(brute_scores[r.vec_id] - r.cosine) < 1e-9
    lists = similarity.ivf_assign(emb, similarity.ivf_centroids(emb)).collect()
    assert len(lists) == emb.count()  # one list per vector — a partition
    assert len({r.vec_id for r in lists}) == len(lists)


def test_pq_index_shape_and_rerank_exact(spark):
    """PQ: the codebook is a complete PQ_M × PQ_CODES grid of
    PQ_SUB-dim codes, every (vector, subspace) encodes to exactly one
    valid code, and — precision-over-recall, like IVF — every returned
    row carries the TRUE cosine (the re-rank stage scores real
    vectors, never reconstructed ones)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    sub = similarity._pq_sub_rows(emb)
    books = similarity.pq_codebooks(sub).collect()
    assert len(books) == similarity.PQ_M * similarity.PQ_CODES
    assert all(len(r.cv) == similarity.PQ_SUB for r in books)
    assert {(r.s, r.cid) for r in books} == {
        (s, c)
        for s in range(similarity.PQ_M)
        for c in range(similarity.PQ_CODES)
    }
    brute_scores = {
        r.vec_id: r.cosine
        for r in similarity.cosine_topk(emb, query_vec_id=0, k=10**9).collect()
    }
    approx = similarity.pq_topk(emb, query_vec_id=0, k=10).collect()
    assert 0 < len(approx) <= 10
    for r in approx:
        assert abs(brute_scores[r.vec_id] - r.cosine) < 1e-9


def test_pq_full_rerank_equals_bruteforce(spark):
    """PQ's only approximation is the ADC shortlist: with rerank >=
    corpus size every vector reaches the exact re-rank stage, so the
    result must equal brute force row for row — codebook training,
    encoding, and the integerized ADC scan provably lose nothing."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    brute = similarity.cosine_topk(emb, query_vec_id=0, k=10).collect()
    full = similarity.pq_topk(emb, query_vec_id=0, k=10, rerank=10**9).collect()
    assert [(r.vec_id, r.cosine) for r in full] == [
        (r.vec_id, r.cosine) for r in brute
    ]


def test_knn_graph_scores_exact_and_bounded(spark):
    """k-NN graph: precision is exact (every edge's cosine matches a
    numpy recomputation), every source has at most k neighbors, no
    self-edges, and each source's list is its TRUE top-k among the
    band-candidate set (the only approximation is candidate
    generation, never the ranking)."""
    import numpy as np

    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}

    def cos(a, b):
        return float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))

    cand = {}
    for r in similarity.sharded_band_rows(emb).collect():
        cand.setdefault((r.band_id, r.band_key, r.shard), []).append(r.vec_id)
    neighbors: dict[int, set[int]] = {}
    for ids in cand.values():
        for x in ids:
            neighbors.setdefault(x, set()).update(y for y in ids if y != x)

    got: dict[int, list] = {}
    for r in similarity.knn_graph(emb, k=3).collect():
        assert r.src != r.dst
        assert abs(cos(r.src, r.dst) - r.cosine) < 1e-6
        got.setdefault(r.src, []).append((r.cosine, r.dst))
    for src, edges in got.items():
        assert len(edges) <= 3
        want = sorted(
            ((round(cos(src, d), 6), d) for d in neighbors[src]),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        have = sorted(edges, key=lambda t: (-t[0], t[1]))
        assert [d for _, d in have] == [d for _, d in want], src


def test_cdc_chunks_survive_prefix_insertion(spark):
    """The property that justifies content-defined chunking: inserting
    a token at the FRONT of a document shifts every fixed-window chunk,
    but CDC boundaries re-synchronize at the first content-determined
    cut — every chunk after it fingerprints identically. The fixed
    chunker shares (almost) nothing under the same edit."""
    from mapreduce_itwiki_spark.plans.training_data import cdc_chunks

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    toks = [vocab[(7 * i + 3) % len(vocab)] for i in range(240)]
    base = " ".join(toks)
    shifted = "INSERTED " + base
    df = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id long, text string"
    )
    chunks = {0: [], 1: []}
    for r in cdc_chunks(df).collect():
        chunks[r.doc_id].append((r.chunk_id, r.n_tokens, r.chunk_fp))
    fps0 = [fp for _, _, fp in sorted(chunks[0])]
    fps1 = [fp for _, _, fp in sorted(chunks[1])]
    assert len(fps0) > 3, "corpus must actually chunk for the test to bite"
    # everything after doc 0's first chunk must reappear verbatim in
    # doc 1 (the first chunk absorbs the insertion, then boundaries
    # re-sync because they depend only on local bigrams)
    assert fps0[1:] == fps1[len(fps1) - len(fps0) + 1 :]


def test_band_sharding_is_lossless_deterministic_and_band_salted(spark):
    """Bucket SHARDING is part of the operator semantics (VERDICT r5
    #1/#4, replacing the old drop-cap): (a) NOTHING is dropped — the
    union of a bucket's shards is exactly its full membership, each
    vector once per band; (b) every shard holds at most max_bucket
    members and shard ids are dense from 0; (c) the shard assignment
    follows the per-band-salted md5 rank bit-for-bit (replayed here
    with hashlib, as the DuckDB oracle replays it with md5()); and
    (d) the rank is the SALTED md5 order, not vec_id order — some hot
    bucket's shard partition differs from contiguous vec_id chunking
    (the r5-flagged bias where the binding always hit high ids)."""
    import hashlib
    import math

    emb = load_table(spark, SF_SMALL, "embeddings")
    full = {}
    for r in similarity.sharded_band_rows(emb, max_bucket=10**9).collect():
        assert r.shard == 0  # one giant shard when nothing is hot
        full.setdefault((r.band_id, r.band_key), []).append(r.vec_id)
    got: dict = {}
    for r in similarity.sharded_band_rows(emb, max_bucket=3).collect():
        got.setdefault((r.band_id, r.band_key), {}).setdefault(
            r.shard, []
        ).append(r.vec_id)
    assert got

    def salted_order(band_id, ids):
        return sorted(
            ids,
            key=lambda v: (
                hashlib.md5(f"{band_id}:{v}".encode()).hexdigest(),
                v,
            ),
        )

    salted_beats_vec_id_order = False
    for (band_id, band_key), shards in got.items():
        members = [v for ids in shards.values() for v in ids]
        # (a) lossless: union of shards == full bucket, no double-count
        assert sorted(members) == sorted(full[(band_id, band_key)])
        # (b) dense shard ids, each within the size bound
        assert set(shards) == set(range(math.ceil(len(members) / 3)))
        for ids in shards.values():
            assert len(ids) <= 3
        # (c) exact md5-rank replay: shard s holds salted-rank slots
        # [3s, 3s+3)
        order = salted_order(band_id, members)
        for s, ids in shards.items():
            assert sorted(ids) == sorted(order[3 * s : 3 * s + 3]), (
                band_id,
                band_key,
                s,
            )
        # (d): the shard partition of some hot bucket must differ from
        # plain vec_id chunking (the biased pre-r6 order)
        by_vec_id = sorted(members)
        if len(members) > 3 and any(
            sorted(shards[s]) != sorted(by_vec_id[3 * s : 3 * s + 3])
            for s in shards
        ):
            salted_beats_vec_id_order = True
    assert salted_beats_vec_id_order, (
        "md5 salt never deviated from vec_id order on any hot bucket"
    )


def test_banded_neardup_is_exact_on_candidates(spark):
    """Precision is exact: every reported pair's cosine matches a numpy
    brute-force recomputation; and banding is multi-probe — it finds at
    least every pair whose FULL 16-bit signature matches (the old
    single-bucket blocking), typically strictly more."""
    import numpy as np

    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}

    def cos(a, b):
        return float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))

    got = {(r.vec_a, r.vec_b): r.cosine for r in
           similarity.bucketed_neardup_pairs(emb, threshold=0.4).collect()}
    assert got, "no near-dup pairs found at threshold 0.4"
    for (a, b), c in got.items():
        assert abs(cos(a, b) - c) < 1e-5, (a, b, cos(a, b), c)
        assert c >= 0.4 - 1e-9

    # full-signature collisions are a subset of >=1-band collisions
    bits = {r.vec_id: r.bits for r in emb.select(
        "vec_id", similarity.bucket_bits(F.col("embedding")).alias("bits")).collect()}
    ids = sorted(bits)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bits[a] == bits[b] and cos(a, b) >= 0.4:
                assert (a, b) in got, (a, b)


def test_simhash_banding_is_complete(spark, docs):
    """Pigeonhole completeness: banded pairs == brute-force pairs ≤ 3."""
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs).collect()}
    brute = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if ham <= 3:
                brute.add((a, b))
    banded = {
        (r.doc_a, r.doc_b) for r in dedup.simhash_dup_pairs(docs).collect()
    }
    assert banded == brute


def test_connected_components_deep_chain(spark):
    """A 41-node path graph (diameter 40): min-label propagation with the
    old fixed 8 iterations propagates labels only 8 hops and would leave
    the far end wrongly labeled — large-star/small-star must converge to
    a single component in O(log n) rounds and label every node 0."""
    from mapreduce_itwiki_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(40)]
    edf = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.node: r.comp for r in connected_components(edf).collect()}
    assert got == {i: 0 for i in range(41)}


def test_connected_components_vs_union_find(spark):
    """Random multi-component graph vs a Python union-find ground truth:
    every node must carry the MINIMUM id reachable from it, including
    star-fixpoint roots and two-node islands."""
    from mapreduce_itwiki_spark.operators.graph import connected_components

    edges = [
        (5, 3), (3, 9), (9, 17), (2, 11), (11, 2), (20, 21),
        (30, 31), (31, 32), (32, 30), (40, 41), (17, 5), (50, 3),
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    edf = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.node: r.comp for r in connected_components(edf).collect()}
    assert got == want


def test_label_propagation_hand_computed(spark):
    """Two triangles joined by one bridge edge, against hand-simulated
    synchronous LPA: after round 1 every node in triangle {1,2,3} holds
    label 1 and every node in {4,5,6} holds 4 — except the bridge
    endpoints, whose neighbor multisets tie and fall to the smallest
    label. Pinning the exact 2-round labels locks both the synchronous
    update and the (-count, label) tie-break."""
    from mapreduce_itwiki_spark.operators.graph import label_propagation

    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    edf = spark.createDataFrame(edges, ["a", "b"])

    # hand-simulate the contract: synchronous, most-frequent neighbor
    # label, ties to the smallest label
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lbl = {n: n for n in adj}
    for _ in range(2):
        nxt = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[lbl[m]] = counts.get(lbl[m], 0) + 1
            nxt[n] = min(counts, key=lambda L: (-counts[L], L))
        lbl = nxt

    got = {r.node: r.community for r in label_propagation(edf, rounds=2).collect()}
    assert got == lbl
    # the two triangles must resolve to distinct dense communities
    assert got[1] == got[2] and got[5] == got[6] and got[1] != got[5]


def test_pagerank_hand_computed(spark):
    """PageRank on a 3-node cycle plus a dangler, against a hand-rolled
    Python fixed-point with identical semantics."""
    from mapreduce_itwiki_spark.operators.graph import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    edf = spark.createDataFrame(edges, ["page_from", "page_to"])
    got = {r.node: r.rank for r in pagerank(edf, iterations=12).collect()}

    nodes = {"a", "b", "c", "d"}
    n = len(nodes)
    out = {"a": 2, "b": 1, "c": 1}
    ranks = {v: 1.0 / n for v in nodes}
    d = 0.85
    for _ in range(12):
        contribs = {v: 0.0 for v in nodes}
        for s, t in edges:
            contribs[t] += ranks[s] / out[s]
        dangling = 1.0 - sum(ranks[v] for v in out)
        ranks = {
            v: (1 - d) / n + d * (contribs[v] + dangling / n) for v in nodes
        }
    for v in nodes:
        assert abs(got[v] - ranks[v]) < 1e-9, (v, got[v], ranks[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6  # probability mass conserved


def test_pagerank_loop_never_collects(spark):
    """Scale contract: the loop body is fully lazy — the dangling-mass
    correction is a broadcast 1-row aggregate folded into the rank
    update's plan, NOT a driver-side collect (which would serialize the
    cluster on the driver once per iteration). Patching collect() to
    explode proves no code path inside pagerank ever calls it; the only
    eager points are the single up-front node count and the scheduled
    lineage checkpoints."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from mapreduce_itwiki_spark.operators.graph import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    edf = spark.createDataFrame(edges, ["page_from", "page_to"])

    def no_collect(self):
        raise AssertionError("DataFrame.collect() called inside pagerank loop")

    with mock.patch.object(DataFrame, "collect", no_collect):
        result = pagerank(edf, iterations=4, checkpoint_every=2)
    assert abs(sum(r.rank for r in result.collect()) - 1.0) < 1e-6


def test_asof_pandas_matches_window_form(spark):
    """pd.merge_asof-style applyInPandas as-of == windowed conditional max."""
    from pyspark.sql import Window

    from mapreduce_itwiki_spark.operators.rangejoin import asof_join_pandas
    from mapreduce_itwiki_spark.sources.parquet import load_table

    events = load_table(spark, SF_SMALL, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expect = {
        (r.event_id, r.user_id): r.last_click_us
        for r in events.withColumn(
            "last_click_ts",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", F.unix_micros("last_click_ts").alias("last_click_us")
        )
        .collect()
    }
    got = {
        (r.event_id, r.user_id): r.last_click_us
        for r in asof_join_pandas(events).collect()
    }
    assert got == expect


def test_approx_aggregates_within_tolerance(spark):
    """The scale-path approximates (HLL distinct, approx percentile)
    against their exact siblings — no cross-engine oracle exists for
    engine-specific sketches, so the engine itself carries the bound."""
    from mapreduce_itwiki_spark.sources.parquet import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05

    events = load_table(spark, SF_SMALL, "events")
    row = events.agg(
        F.percentile_approx("value", 0.5).alias("approx"),
        F.percentile("value", F.lit(0.5)).alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / max(row.exact, 1e-9) < 0.05


def test_ngram_jaccard_df_cap_drops_stop_shingle_candidates(spark):
    """The DF cap changes CANDIDATE GENERATION only: a pair whose every
    common shingle is near-universal produces no candidate, while pairs
    sharing any uncapped shingle are scored on their FULL shingle sets
    (the universal shingle still counts toward their Jaccard)."""
    boiler = "terms of service apply"
    rows = [
        # identical tiny docs whose only content is the boilerplate
        (0, boiler),
        (1, boiler),
        # near-identical docs sharing rare shingles AND the boilerplate
        (2, "alpha beta gamma delta " + boiler),
        (3, "alpha beta gamma delta " + boiler),
    ] + [
        # enough extra carriers to push every boilerplate shingle over the cap
        (10 + i, f"filler{i} unique{i} words{i} " + boiler)
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_dups(docs, threshold=0.5, max_df=5).collect()
    }
    # docs 0/1 are identical (true jaccard 1.0) but share ONLY capped
    # shingles -> no candidate, excluded by design
    assert (0, 1) not in got
    # docs 2/3 share uncapped shingles -> found, scored on full sets
    assert got[(2, 3)] == 1.0
    # no-cap baseline finds the boilerplate-only pair too
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_dups(docs, threshold=0.5, max_df=10**9).collect()
    }
    assert (0, 1) in uncapped and (2, 3) in uncapped


def test_jpeg_uniform_blocks_roundtrip_exact():
    """DC-only blocks with DC quant step 8 reconstruct bit-exactly —
    the property the multimodal_jpeg_decode oracle relies on."""
    import numpy as np

    rng = np.random.default_rng(7)
    vals = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    img = np.repeat(np.repeat(np.frombuffer(vals, np.uint8).reshape(8, 8), 8, 0), 8, 1)
    payload = multimodal.encode_jpeg_gray(img.tobytes(), 64)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    w, h, px = multimodal.decode_jpeg_gray(payload)
    assert (w, h) == (64, 64)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(64, 64), img)


def test_jpeg_general_image_lossy_but_close():
    """The codec is a real baseline JPEG, not a uniform-block special
    case: arbitrary (non-square, AC-heavy) images survive the full
    DCT → quant → Huffman → dequant → IDCT loop within the quantization
    error bound; smooth content reconstructs almost exactly."""
    import numpy as np

    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    w, h, px = multimodal.decode_jpeg_gray(
        multimodal.encode_jpeg_gray(noise.tobytes(), 40)
    )
    assert (w, h) == (40, 32)
    err = np.abs(np.frombuffer(px, np.uint8).reshape(32, 40).astype(int) - noise)
    assert err.max() <= 48 and err.mean() <= 8

    grad = np.fromfunction(lambda y, x: (x * 3 + y * 2) % 256, (16, 16)).astype(np.uint8)
    _, _, px2 = multimodal.decode_jpeg_gray(
        multimodal.encode_jpeg_gray(grad.tobytes(), 16)
    )
    err2 = np.abs(np.frombuffer(px2, np.uint8).reshape(16, 16).astype(int) - grad)
    assert err2.max() <= 8


def test_jpeg_decoder_reads_tables_from_file():
    """The decoder honors the DQT embedded in the file rather than
    assuming the encoder's table: hand-patch a different AC quant value
    and the decode must change accordingly (proves table parsing)."""
    import numpy as np

    grad = np.fromfunction(lambda y, x: (x * 7) % 256, (8, 8)).astype(np.uint8)
    payload = bytearray(multimodal.encode_jpeg_gray(grad.tobytes(), 8))
    _, _, before = multimodal.decode_jpeg_gray(bytes(payload))
    # DQT payload starts after FFDB + length(2) + PqTq(1); zigzag idx 1
    # is the first AC entry
    i = payload.index(b"\xff\xdb") + 5 + 1
    assert payload[i] == 16
    payload[i] = 255
    _, _, after = multimodal.decode_jpeg_gray(bytes(payload))
    assert before != after


def test_gif_multiframe_roundtrip_exact():
    """Lossless animated-GIF round-trip: N random frames survive LZW
    encode → sub-block framing → decode bit-exactly, in order."""
    import numpy as np

    rng = np.random.default_rng(13)
    frames = [bytes(rng.integers(0, 256, 16, dtype=np.uint8)) for _ in range(4)]
    gif = multimodal.encode_gif_gray(frames, 4)
    assert gif[:6] == b"GIF89a" and gif[-1] == 0x3B
    w, h, out = multimodal.decode_gif_gray(gif)
    assert (w, h) == (4, 4) and out == frames

    # non-square, frame large enough to force LZW code-width growth
    big = [bytes(rng.integers(0, 256, 96 * 40, dtype=np.uint8)) for _ in range(3)]
    assert multimodal.decode_gif_gray(multimodal.encode_gif_gray(big, 96)) == (96, 40, big)


def test_gif_lzw_width_growth_and_table_reset():
    """The LZW pair agrees across the two hard regimes: code-width
    growth at 512/1024/2048/4096 (where encoder and decoder grow one
    dictionary-add apart) and the 12-bit table-full clear-code reset."""
    import numpy as np

    rng = np.random.default_rng(17)
    for data in (
        b"",
        bytes([7]) * 30000,  # KwKwK-heavy runs
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),  # growth + reset
        bytes(rng.integers(0, 2, 50000, dtype=np.uint8)),  # deep dictionary chains
    ):
        enc = multimodal._lzw_encode_gif(data, 8)
        assert multimodal._lzw_decode_gif(enc, 8) == data


def test_gif_decoder_reads_palette_from_file():
    """The decoder maps indices through the palette IN THE FILE, not an
    assumed identity ramp: patch one palette entry and the decoded
    pixels must change accordingly (proves palette parsing)."""
    payload = bytearray(multimodal.encode_gif_gray([bytes([5] * 16)], 4))
    _, _, before = multimodal.decode_gif_gray(bytes(payload))
    assert before[0] == bytes([5] * 16)
    # global color table starts at offset 13; entry 5's red channel
    payload[13 + 3 * 5] = 200
    _, _, after = multimodal.decode_gif_gray(bytes(payload))
    assert after[0] == bytes([200] * 16)


def test_gif_decoder_rejects_interlace():
    payload = bytearray(multimodal.encode_gif_gray([bytes(16)], 4))
    # image descriptor: 0x2C after header+GCT+netscape+GCE; packed byte
    # is 9 bytes into the descriptor
    i = payload.index(0x2C, 13 + 768)
    payload[i + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        multimodal.decode_gif_gray(bytes(payload))


def test_codec_padding_matches_oracle_past_end_semantics(spark, duck):
    """ADVICE r2: a document SHORTER than the codec window must agree
    with the oracle's out-of-range arithmetic (ascii('') = 0 ⇒ pixel 0,
    WAV sample −128) by construction, not corpus accident."""
    from mapreduce_itwiki_spark.plans.llm_pipeline import _head_bytes

    assert _head_bytes("short", 8) == b"short\x00\x00\x00"
    with pytest.raises(ValueError):
        _head_bytes("héllo", 8)

    rows = [(1, "tiny doc"), (2, "x")]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])

    import pandas as pd

    def to_wav(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "wav": [
                        multimodal.encode_wav_pcm16(
                            [b - 128 for b in _head_bytes(t, 32)]
                        )
                        for t in pdf["text"]
                    ],
                }
            )

    from pyspark.sql import types as T

    audio = sdf.mapInPandas(
        to_wav,
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("wav", T.BinaryType())]
        ),
    )
    got = {r.doc_id: r.rms for r in multimodal.audio_stats(audio).collect()}

    duck.execute("CREATE OR REPLACE TEMP TABLE tiny_docs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO tiny_docs VALUES (?, ?)", rows)
    oracle = dict(
        duck.execute(
            """
            SELECT doc_id,
                   round(sqrt(list_avg(list_transform(range(1, 33),
                         i -> (ascii(substr(text, i, 1)) - 128)
                              * (ascii(substr(text, i, 1)) - 128)))), 6)
            FROM tiny_docs
            """
        ).fetchall()
    )
    assert got == oracle


def test_connected_components_keeps_selfloop_only_nodes(spark):
    """A node that appears ONLY in self-loop edges must still receive its
    (node, node) label — deriving the node set from the self-loop-filtered
    edge frame silently dropped such nodes (round-3 review finding)."""
    from mapreduce_itwiki_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    got = {
        (r["node"], r["comp"])
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (5, 5)}, got


def test_bpe_train_semantics_on_tiny_corpus(spark):
    """Pin the BPE trainer's exact rules on a handcrafted corpus:
    overlapping adjacency counting ('aaa' yields (a,a) twice), greedy
    left-to-right merge application ('aaa' -> [aa][a]), the word-
    boundary rule (pairs touching the space symbol are never
    candidates), and the deterministic count-DESC-then-lexicographic
    tie-break ((a,a) beats (a,b) at equal count; ('aa','a') beats
    ('b','b'))."""
    from mapreduce_itwiki_spark.plans.training_data import train_bpe

    docs = spark.createDataFrame(
        [(1, "aaa bb"), (2, "ab ab")], "doc_id long, text string"
    )
    merges = train_bpe(docs, rounds=3)
    assert merges == [("a", "a", 2), ("a", "b", 2), ("aa", "a", 1)]


def test_bpe_train_degenerate_corpus_stops_early(spark):
    """A corpus with no mergeable adjacency (every char pair spans a
    space) must return an empty merge table, not loop or throw."""
    from mapreduce_itwiki_spark.plans.training_data import train_bpe

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert train_bpe(docs, rounds=2) == []


def test_split_leakage_safe_never_splits_a_dup_pair(spark):
    """The semantic contract directly: for EVERY emitted near-dup pair,
    both documents must land on the same side of the train/val split
    (they share a cluster representative by construction)."""
    from mapreduce_itwiki_spark.operators import dedup
    from mapreduce_itwiki_spark.plans.llm_pipeline import split_leakage_safe
    from mapreduce_itwiki_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    split = {
        r["doc_id"]: r["split"]
        for r in split_leakage_safe(spark, sf).collect()
    }
    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dups(docs, threshold=0.5).collect()
    assert pairs, "fixture has no near-dup pairs; property is vacuous"
    for p in pairs:
        assert split[p["doc_a"]] == split[p["doc_b"]], (
            p["doc_a"], p["doc_b"])


def test_remove_duplicate_blocks_output_is_ordered_subsequence(spark):
    """Block removal may only DELETE whole blocks: every cleaned text
    must be an in-order token subsequence of the original, docs with
    no corpus-shared blocks must come back verbatim, and at least one
    doc must actually lose text (non-vacuity)."""
    from mapreduce_itwiki_spark.plans.training_data import (
        remove_duplicate_blocks,
    )
    from mapreduce_itwiki_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    cleaned = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_duplicate_blocks(spark, sf).collect()
    }
    original = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf, "documents").collect()
    }
    assert set(cleaned) == set(original)
    changed = 0
    for doc_id, text in original.items():
        out, src = cleaned[doc_id].split(), iter(text.split())
        # subsequence check: consume source tokens greedily
        for tok in out:
            for s in src:
                if s == tok:
                    break
            else:
                raise AssertionError(f"{doc_id}: not a subsequence")
        if cleaned[doc_id] != text:
            changed += 1
    assert changed > 0, "no doc lost any block; property is vacuous"


def test_duplicate_spans_planted_and_merged(spark):
    """Plant one 12-token passage inside two otherwise-disjoint
    documents at DIFFERENT offsets: the operator must report exactly one
    maximal span per document covering the planted extent (the
    block-aligned family can't see this — the copy is not block-aligned
    in doc B), and a third document with no shared 8-grams must report
    nothing."""
    from mapreduce_itwiki_spark.plans.training_data import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
    a = " ".join(f"a{i}" for i in range(5)) + " " + shared + " " + " ".join(
        f"z{i}" for i in range(4)
    )  # shared at positions 6..17
    b = " ".join(f"b{i}" for i in range(9)) + " " + shared  # at 10..21
    c = " ".join(f"c{i}" for i in range(20))  # no overlap
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "text"]
    )
    rows = {
        (r.doc_id, r.start_pos, r.end_pos, r.n_tokens)
        for r in duplicate_spans(df, 8).collect()
    }
    assert rows == {(1, 6, 17, 12), (2, 10, 21, 12)}


def test_duplicate_spans_merge_islands_not_grams(spark):
    """Two shared passages separated by a unique gap inside the same
    document must come back as TWO spans (the island merge must not
    bridge the gap), each with correct extents."""
    from mapreduce_itwiki_spark.plans.training_data import duplicate_spans

    p1 = " ".join(f"p{i}" for i in range(8))
    p2 = " ".join(f"q{i}" for i in range(8))
    a = p1 + " gapa0 gapa1 gapa2 " + p2          # p1 at 1..8, p2 at 12..19
    b = p2 + " gapb0 gapb1 gapb2 gapb3 " + p1    # p2 at 1..8, p1 at 13..20
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    rows = {
        (r.doc_id, r.start_pos, r.end_pos) for r in duplicate_spans(df, 8).collect()
    }
    assert rows == {(1, 1, 8), (1, 12, 19), (2, 1, 8), (2, 13, 20)}


def test_remove_duplicate_spans_keep_first_policy(spark):
    """Keep-first semantics pinned on a planted copy: the passage
    shared by docs 1 and 2 survives verbatim in doc 1 (the lower
    doc_id owns every duplicated gram) and is cut from doc 2; unique
    prose survives in both, in original order."""
    from mapreduce_itwiki_spark.plans.training_data import remove_spans

    shared = " ".join(f"s{i}" for i in range(12))
    a = "a0 a1 " + shared + " a2 a3"
    b = "b0 b1 b2 " + shared + " b4"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    out = {r.doc_id: r for r in remove_spans(df, 8).collect()}
    assert out[1].cleaned_text == a  # owner keeps everything
    assert out[1].n_removed == 0
    assert out[2].cleaned_text == "b0 b1 b2 b4"
    assert out[2].n_removed == 12


def test_ewma_matches_python_recursion(spark):
    """The catalog's dyadic-weight EWMA (training_data.ewma_user_value)
    against the textbook truncated recursion computed in plain Python:
    y_i = Σ_{j=0..min(7,i)} 2^-(j+1) · x_{i-j}. Exercises frames
    shorter than 8 (early rows), exactly 8, and the cent conversion."""
    from mapreduce_itwiki_spark.plans import catalog
    import itertools

    sdf = catalog.queries()["ewma_user_value"](spark, SF_SMALL)
    got = {r.event_id: r.ewma8 for r in sdf.collect()}

    events = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    rows = sorted(
        ((r.user_id, r.ts, r.event_id, r.value) for r in events.collect())
    )
    for _, grp in itertools.groupby(rows, key=lambda r: r[0]):
        hist = []
        for _, _, event_id, value in grp:
            hist.append(round(value * 100))
            window = hist[-8:]
            expect = sum(
                c * 2.0 ** -(j + 1) for j, c in enumerate(reversed(window))
            ) / 100.0
            assert got[event_id] == expect, event_id


def test_bfs_matches_python_bfs(spark):
    """bfs_hop_distance against a plain-Python breadth-first search over
    the same (deterministic) near-dup pair list."""
    from collections import deque

    from mapreduce_itwiki_spark.plans import catalog

    docs = load_table(spark, SF_SMALL, "documents")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_near_dups(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .collect()
    ]
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sources = sorted(adj)[:3]
    dist = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        u = dq.popleft()
        if dist[u] >= 4:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    got = {
        r.node: r.dist
        for r in catalog.queries()["bfs_hop_distance"](spark, SF_SMALL).collect()
    }
    assert got == dist


def test_pca_covariance_matches_numpy(spark):
    """embedding_covariance against numpy's biased covariance on the
    collected corpus — error bounded by the 6-dp rounding grid."""
    import numpy as np

    from mapreduce_itwiki_spark.operators import pca

    emb = load_table(spark, SF_SMALL, "embeddings")
    x = np.array(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.select("embedding").collect()]
    )
    c_true = np.cov(x, rowvar=False, bias=True)
    got = {(r.i, r.j): r.cov for r in pca.covariance_upper(emb).collect()}
    assert len(got) == 64 * 65 // 2
    assert all(i <= j for i, j in got)
    worst = max(abs(v - c_true[i - 1, j - 1]) for (i, j), v in got.items())
    assert worst < 6e-7, worst


def test_pca_power_iteration_matches_unrounded_numpy(spark):
    """top_component against the same 2 power-iteration rounds replayed
    in numpy WITHOUT the 9-dp intermediate rounding — proves the
    rounding discipline changes nothing beyond its own grid. (The
    corpus spectrum is nearly flat — λ2/λ1 ≈ 0.93 — so 2 rounds are a
    defined transform, not the converged eigenvector; convergence on a
    dominated spectrum is pinned separately below.)"""
    import numpy as np

    from mapreduce_itwiki_spark.operators import pca

    emb = load_table(spark, SF_SMALL, "embeddings")
    cov_rows = pca.covariance_upper(emb).collect()
    c = np.zeros((64, 64))
    for r in cov_rows:
        c[r.i - 1, r.j - 1] = r.cov
        c[r.j - 1, r.i - 1] = r.cov
    v = np.ones(64)
    for _ in range(pca.POWER_ITERS):
        v = c @ v
        v = v / np.sqrt(v @ v)
    got = np.array(
        [r.w for r in pca.top_component(pca.covariance_upper(emb)).orderBy("i").collect()]
    )
    assert np.max(np.abs(got - v)) < 1e-6


def test_pca_converges_on_planted_dominant_direction(spark):
    """On a corpus WITH a dominant principal direction (a planted rank-1
    spike 10× the noise scale — the anisotropy real LM embedding
    corpora exhibit), 2 power rounds recover the true eigenvector to
    |cos| > 0.999 — the flat-spectrum testdata, not the operator, is
    why the previous test can't assert alignment."""
    import numpy as np

    from mapreduce_itwiki_spark.operators import pca

    d, n = 64, 200
    u = np.array([((7 * i + 3) % 13) - 6 for i in range(d)], dtype=np.float64)
    u /= np.sqrt(u @ u)
    rows = []
    for k in range(n):
        a = ((k * 17) % 41) - 20  # deterministic spike coefficient
        noise = np.array(
            [(((k * 31 + i * 57) % 23) - 11) / 11.0 for i in range(d)]
        )
        rows.append((k, (10.0 * a * u + noise).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = np.array(
        [r.w for r in pca.top_component(pca.covariance_upper(emb)).orderBy("i").collect()]
    )
    x = np.array([r[1] for r in rows])
    c = np.cov(x, rowvar=False, bias=True)
    _, evecs = np.linalg.eigh(c)
    assert abs(got @ evecs[:, -1]) > 0.999


def test_pca_mahalanobis_matches_numpy(spark):
    """outlier_scores against numpy's diagonal Mahalanobis on the
    collected corpus — error bounded by the rounding grids."""
    import numpy as np

    from mapreduce_itwiki_spark.operators import pca

    emb = load_table(spark, SF_SMALL, "embeddings")
    x = np.array(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in emb.select("embedding").orderBy("vec_id").collect()
        ]
    )
    mu, sigma = x.mean(axis=0), x.std(axis=0)
    true = np.sqrt((((x - mu) / sigma) ** 2).sum(axis=1))
    got = {r.vec_id: r.maha for r in pca.outlier_scores(emb).collect()}
    worst = max(abs(got[k] - true[k]) for k in got)
    assert worst < 1e-5, worst
    # scores are a meaningful spread, not a constant
    vals = np.array(list(got.values()))
    assert vals.std() > 0.01


def test_corpus_drift_kl_properties(spark, tmp_path):
    """KL-divergence properties on constructed corpora: identical
    old/new token distributions give exactly 0 (smoothing included);
    disjoint vocabularies give a large positive value; both directions
    are always ≥ 0 (Gibbs' inequality survives the rounding)."""
    import pandas as pd

    from mapreduce_itwiki_spark.plans import catalog
    from mapreduce_itwiki_spark.plans.training_data import INCR_SPLIT

    rows = []
    # lang 'same': old and new halves share one distribution
    for k in range(40):
        doc_id = k if k < 20 else INCR_SPLIT + (k - 20)
        rows.append((doc_id, "same", "alpha beta gamma alpha", "t", 22))
    # lang 'drift': disjoint vocabularies across the split
    for k in range(20):
        rows.append((1000 + k if k >= 10 else 100 + k, "drift",
                     "aaa bbb ccc" if k < 10 else "xxx yyy zzz", "t", 11))
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text", "source", "n_chars"])
    d = str(tmp_path / "kl")
    import os
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    got = {r.lang: r for r in catalog.queries()["corpus_drift_kl"](spark, d).collect()}
    assert got["same"].kl_old_new == 0.0 and got["same"].kl_new_old == 0.0
    assert got["drift"].kl_old_new > 1.0 and got["drift"].kl_new_old > 1.0
    for r in got.values():
        assert r.kl_old_new >= 0.0 and r.kl_new_old >= 0.0


def test_ngram_diversity_short_doc_edge(spark, tmp_path):
    """Documents shorter than the gram (1- and 2-token docs) must emit
    NO 2-/3-grams — Spark's sequence(1, 0) yields a DESCENDING [1, 0]
    where DuckDB's range is empty, so the explicit empty-array guard
    in ngram_diversity_report is load-bearing. Hand-computed corpus:
    lang 'xx' = {"one", "two words", "a b c", "a b c"}:
    unigrams 9 tokens, 6 distinct; bigrams {"two words","a b","b c"}
    over 5 occurrences; trigrams {"a b c"} over 2 occurrences."""
    import os

    import pandas as pd

    from mapreduce_itwiki_spark.plans import catalog

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "lang": ["xx"] * 4,
            "text": ["one", "two words", "a b c", "a b c"],
            "source": ["t"] * 4,
            "n_chars": [3, 9, 5, 5],
        }
    )
    d = str(tmp_path / "short")
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    rows = catalog.queries()["ngram_diversity_report"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.distinct_1 == round(6 / 9, 6)
    assert r.distinct_2 == round(3 / 5, 6)
    assert r.distinct_3 == round(1 / 2, 6)


def test_pca_rejects_wrong_embedding_dim(spark):
    """The moments pass enforces d = 64 on the DATA (the 1/8 start
    vector and range(1, 65) oracles are 64-specific) — a 32-dim corpus
    must fail loudly, not run with a wrong-norm start vector."""
    import pytest as _pytest

    from mapreduce_itwiki_spark.operators import pca

    emb = spark.createDataFrame(
        [(0, [1.0] * 32), (1, [2.0] * 32)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="embedding dim 32"):
        pca.covariance_upper(emb).collect()


def test_pca_two_components_on_planted_two_spikes(spark):
    """On a corpus with TWO dominant orthogonal directions (rank-2
    spikes at 16× and 6× the noise scale), deflation recovers both:
    v1 aligns with the top eigenvector, v2 with the second, and the
    two estimates are near-orthogonal. Proves the deflation step
    actually removes the first component rather than re-finding it."""
    import numpy as np

    from mapreduce_itwiki_spark.operators import pca

    d, n = 64, 240
    u1 = np.array([((7 * i + 3) % 13) - 6 for i in range(d)], dtype=np.float64)
    u1 /= np.sqrt(u1 @ u1)
    u2 = np.array([((11 * i + 5) % 17) - 8 for i in range(d)], dtype=np.float64)
    u2 -= (u2 @ u1) * u1  # orthogonalize against u1
    u2 /= np.sqrt(u2 @ u2)
    rows = []
    for k in range(n):
        a = ((k * 17) % 41) - 20
        b = ((k * 23) % 37) - 18
        noise = np.array(
            [(((k * 31 + i * 57) % 23) - 11) / 11.0 for i in range(d)]
        )
        rows.append((k, (16.0 * a * u1 + 6.0 * b * u2 + noise).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v1, v2 = pca.top_two_components(pca.covariance_upper(emb))
    w1 = np.array([r.w for r in v1.orderBy("i").collect()])
    w2 = np.array([r.w for r in v2.orderBy("i").collect()])
    x = np.array([r[1] for r in rows])
    c = np.cov(x, rowvar=False, bias=True)
    _, evecs = np.linalg.eigh(c)
    assert abs(w1 @ evecs[:, -1]) > 0.995
    assert abs(w2 @ evecs[:, -2]) > 0.95
    assert abs(w1 @ w2) < 0.15


def test_kcore_peels_cascading_chain(spark):
    """kcore on a constructed graph where deletion CASCADES: a 5-clique
    (its own 4-core) with a pendant path hanging off one clique node.
    Each peeling round exposes the next path node, so a fixed-1-round
    'degree filter' would keep path remnants — the loop must iterate to
    the fixpoint."""
    from mapreduce_itwiki_spark.operators.graph import kcore

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    path = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + path, ["x", "y"])
    got = {r.node: r.core_degree for r in kcore(edges, 4).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_kcore_empty_core_is_empty_frame(spark):
    """A tree has no 2-core at k=3; the loop must converge to the empty
    edge set without raising."""
    from mapreduce_itwiki_spark.operators.graph import kcore

    tree = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)], ["x", "y"]
    )
    assert kcore(tree, 3).count() == 0


def test_kcore_oracle_unroll_is_converged(duck):
    """The shipped 6-round unrolled oracle must already be at the
    peeling fixpoint on the oracle-scale data: one MORE unrolled round
    changes nothing. This is what lets the parity hash certify
    convergence (the round-2 fixed-iteration-CC lesson)."""
    from mapreduce_itwiki_spark.plans.llm_pipeline import _kcore_oracle_sql

    r6 = sorted(duck.execute(_kcore_oracle_sql(6)).fetchall())
    r7 = sorted(duck.execute(_kcore_oracle_sql(7)).fetchall())
    assert r6 == r7
    assert len(r6) > 0


def test_jl_projection_matches_numpy(spark):
    """embedding_random_projection against numpy: rebuild the ±1 sign
    matrix from the same md5 grid and compare the projected values."""
    import hashlib

    import numpy as np

    from mapreduce_itwiki_spark.plans import catalog
    from mapreduce_itwiki_spark.sources.parquet import load_table
    from conftest import SF_SMALL

    S = np.array(
        [
            [
                1
                if int(hashlib.md5(f"jl|{i}|{j}".encode()).hexdigest()[:15], 16) % 2 == 0
                else -1
                for j in range(8)
            ]
            for i in range(1, 65)
        ],
        dtype=np.float64,
    )
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }
    got = {
        r.vec_id: [r[f"p{j}"] for j in range(8)]
        for r in catalog.queries()["embedding_random_projection"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(emb)
    inv = 0.35355339059327373
    for vid, v in emb.items():
        expect = (v @ S) * inv
        for j in range(8):
            assert abs(got[vid][j] - expect[j]) < 1e-5, (vid, j)


def test_jl_projection_preserves_distances_on_average(spark):
    """The JL property itself (sanity, not parity): across sampled
    pairs, the MEAN squared-distance ratio projected/original is near 1
    (each ratio is an unbiased estimator with variance ~2/k)."""
    import numpy as np

    from mapreduce_itwiki_spark.plans import catalog
    from mapreduce_itwiki_spark.sources.parquet import load_table
    from conftest import SF_SMALL

    rows = sorted(
        (
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
            for r in load_table(spark, SF_SMALL, "embeddings").collect()
        ),
    )[:40]
    proj = {
        r.vec_id: np.array([r[f"p{j}"] for j in range(8)])
        for r in catalog.queries()["embedding_random_projection"](
            spark, SF_SMALL
        ).collect()
    }
    ratios = []
    for a in range(0, 40, 2):
        (ida, va), (idb, vb) = rows[a], rows[a + 1]
        d0 = float(np.sum((va - vb) ** 2))
        d1 = float(np.sum((proj[ida] - proj[idb]) ** 2))
        if d0 > 0:
            ratios.append(d1 / d0)
    m = sum(ratios) / len(ratios)
    assert 0.6 < m < 1.4, m


def test_kcore_nesting_property(spark):
    """(k+1)-core ⊆ k-core, and within-core degrees can only DROP when k
    rises — the structural invariant of the decomposition, checked on
    the catalog's 3-out graph."""
    from mapreduce_itwiki_spark.operators.graph import kcore
    from mapreduce_itwiki_spark.plans.llm_pipeline import KCORE_OUT
    from mapreduce_itwiki_spark.plans import catalog
    from mapreduce_itwiki_spark.sources.parquet import load_table
    from conftest import SF_SMALL
    import hashlib

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    ids = [r.doc_id for r in docs.collect()]
    n = len(ids)
    edges = set()
    for d in ids:
        for j in range(KCORE_OUT):
            y = int(hashlib.md5(f"{d}#{j}".encode()).hexdigest()[:15], 16) % n
            if y != d:
                edges.add((min(d, y), max(d, y)))
    edf = spark.createDataFrame(sorted(edges), ["x", "y"])
    c3 = {r.node: r.core_degree for r in kcore(edf, 3).collect()}
    c4 = {r.node: r.core_degree for r in kcore(edf, 4).collect()}
    assert set(c4) <= set(c3)
    for node, d4 in c4.items():
        assert d4 <= c3[node]
    # and the catalog query equals the operator run on the same edges
    got = {
        r.node: r.core_degree
        for r in catalog.queries()["kcore_membership"](spark, SF_SMALL).collect()
    }
    assert got == c4


def test_tree_split_gain_bounds(spark):
    """Gini gain of the chosen split is in (0, 0.5] and the split bin is
    an interior boundary (a real left/right partition exists)."""
    from mapreduce_itwiki_spark.plans import catalog
    from mapreduce_itwiki_spark.sources.parquet import load_table
    from conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem").select("l_quantity")
    qmax = int(round(max(r.l_quantity for r in li.collect())))
    rows = {
        r.feature: (r.split_bin, r.gain)
        for r in catalog.queries()["tree_split_histogram"](spark, SF_SMALL).collect()
    }
    assert set(rows) == {"quantity", "discount", "tax"}
    for feat, (bin_, gain) in rows.items():
        assert 0 <= gain <= 0.5, feat
        if feat == "quantity":
            assert bin_ < qmax


def test_gopher_rules_are_each_non_vacuous(spark):
    """Every Gopher rule must discriminate on the corpus (pass some,
    fail some) — a threshold that everything passes proves nothing."""
    from mapreduce_itwiki_spark.plans import catalog
    from conftest import SF_SMALL

    rows = catalog.queries()["gopher_quality_rules"](spark, SF_SMALL).collect()
    for rule in ("r_word_count", "r_mean_wlen", "r_stopwords", "gopher_pass"):
        vals = {getattr(r, rule) for r in rows}
        assert vals == {True, False}, f"{rule} is vacuous: {vals}"


def test_jpeg_color_uniform_tiles_roundtrip_exact():
    """4:2:0 color JPEG: constant-color 16x16 MCU tiles reconstruct all
    THREE planes bit-exactly (DC step 8 + floor(x+0.5) conversion) —
    the property the multimodal_jpeg_color_decode oracle relies on."""
    import numpy as np

    rng = np.random.default_rng(13)
    vals = rng.integers(0, 128, size=(16, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(vals.reshape(4, 4, 3), 16, 0), 16, 1)
    payload = multimodal.encode_jpeg_color(img.tobytes(), 64)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    w, h, yb, cbb, crb = multimodal.decode_jpeg_color(payload)
    assert (w, h) == (64, 64)
    ey, ecb, ecr = multimodal._ycc_from_rgb(img.astype(np.float64))
    assert np.array_equal(
        np.frombuffer(yb, np.uint8).reshape(64, 64), ey.astype(np.uint8)
    )
    # uniform tiles: subsampled chroma == floor-rounded plane at half res
    for got, full in ((cbb, ecb), (crb, ecr)):
        sub = np.floor(full.reshape(32, 2, 32, 2).mean(axis=(1, 3)) + 0.5)
        assert np.array_equal(
            np.frombuffer(got, np.uint8).reshape(32, 32), sub.astype(np.uint8)
        )


def test_jpeg_color_general_image_lossy_but_close():
    """Arbitrary color content survives the full interleaved-MCU loop
    (per-component DC predictors, shared Annex-K tables) within the
    flat-16 quantization error bound."""
    import numpy as np

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    w, h, yb, cbb, crb = multimodal.decode_jpeg_color(
        multimodal.encode_jpeg_color(img.tobytes(), 48)
    )
    assert (w, h) == (48, 32)
    ey, ecb, ecr = multimodal._ycc_from_rgb(img.astype(np.float64))
    yerr = np.abs(np.frombuffer(yb, np.uint8).reshape(32, 48).astype(float) - ey)
    assert yerr.max() <= 48 and yerr.mean() <= 8
    cb = np.frombuffer(cbb, np.uint8).reshape(16, 24).astype(float)
    ecb_s = ecb.reshape(16, 2, 24, 2).mean(axis=(1, 3))
    assert np.abs(cb - ecb_s).max() <= 48


def test_stopword_count_java_regex_matches_hof_twin(spark):
    """The escaped stopword alternation must count identically under
    JAVA regex (the engine side, regexp_count) and the naive HOF
    membership filter — on a word list made entirely of regex
    metacharacters. Pins both the re.escape fix (VERDICT r4 #7) and
    Python↔Java agreement on escaped-literal alternations."""
    from mapreduce_itwiki_spark.functions.text import stopword_regex

    words = ("a.c", "x|y", "c++", "[the]", "$5", "a*")
    rows = [
        ("a.c x|y a.c",),
        ("abc xy aXc axc",),  # regex-shaped lookalikes: zero matches
        ("c++ c++ c++",),
        ("[the] the $5 a* aa",),
        ("",),
        ("plain words only",),
        ("a.c a.c",),
    ]
    df = spark.createDataFrame(rows, "text string")
    pat = stopword_regex(words)
    out = df.select(
        F.regexp_count(
            F.concat(F.lit(" "), F.col("text"), F.lit(" ")), F.lit(pat)
        ).alias("rx"),
        F.size(
            F.filter(F.split("text", " "), lambda t: t.isin(*words))
        ).alias("hof"),
    ).collect()
    for r in out:
        assert r.rx == r.hof, (r.rx, r.hof)


def test_batch_ann_equals_single_query_loop(spark):
    """lsh_batch_topk / ivf_batch_topk answer EVERY query exactly as
    the single-query operators would (the batch is a shared-pass
    optimization, not a semantics change): per-qid slices must equal
    lsh_bucket_topk / ivf_topk run one query at a time."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = list(range(4))
    queries = spark.createDataFrame([(q,) for q in qids], "qid long")

    batch = {
        q: sorted((r.vec_id, r.cosine) for r in rows)
        for q, rows in _group_by_qid(
            similarity.lsh_batch_topk(emb, queries, k=10).collect()
        ).items()
    }
    for q in qids:
        single = sorted(
            (r.vec_id, r.cosine)
            for r in similarity.lsh_bucket_topk(emb, query_vec_id=q, k=10).collect()
        )
        assert batch.get(q, []) == single, q

    batch_ivf = {
        q: sorted((r.vec_id, r.cosine) for r in rows)
        for q, rows in _group_by_qid(
            similarity.ivf_batch_topk(emb, queries, k=10).collect()
        ).items()
    }
    for q in qids:
        single = sorted(
            (r.vec_id, r.cosine)
            for r in similarity.ivf_topk(emb, query_vec_id=q, k=10).collect()
        )
        assert batch_ivf.get(q, []) == single, q


def _group_by_qid(rows):
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r.qid, []).append(r)
    return out


def test_sampled_ivf_trains_on_exact_md5_subset(spark):
    """ivf_centroids(sample_mod=4) must equal ivf_centroids(None) run
    on the pre-filtered md5 subset with the same seed rule — the
    sampled trainer is a restriction, not a different algorithm."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    sampled = similarity.ivf_centroids(
        emb, sample_mod=similarity.TRAIN_SAMPLE_MOD
    ).collect()
    subset = emb.filter(
        similarity.sample_coin(F.col("vec_id"), similarity.TRAIN_SAMPLE_MOD)
    )
    # full-corpus trainer on the subset, but seeds are 'vec_id < nlist'
    # which the sampled path replaces with the nlist smallest sampled
    # ids — replicate via a dense re-id of the subset
    from pyspark.sql import Window as W

    reid = subset.withColumn(
        "new_id",
        F.row_number().over(W.orderBy("vec_id")) - 1,
    )
    mapping = {r.new_id: r.vec_id for r in reid.select("new_id", "vec_id").collect()}
    renamed = reid.drop("vec_id").withColumnRenamed("new_id", "vec_id")
    expect = similarity.ivf_centroids(renamed).collect()
    got = {tuple(r.cv) for r in sampled}
    want = {tuple(r.cv) for r in expect}
    assert got == want
    # and cids map back to the original sampled ids
    assert {r.cid for r in sampled} == {mapping[r.cid] for r in expect}


def test_batch_pq_equals_single_query_loop(spark):
    """pq_batch_topk per-qid slices must equal pq_topk run one query at
    a time (shared training/encode is an optimization, not a semantics
    change)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = list(range(4))
    queries = spark.createDataFrame([(q,) for q in qids], "qid long")
    batch = {
        q: sorted((r.vec_id, r.cosine) for r in rows)
        for q, rows in _group_by_qid(
            similarity.pq_batch_topk(emb, queries, k=10).collect()
        ).items()
    }
    for q in qids:
        single = sorted(
            (r.vec_id, r.cosine)
            for r in similarity.pq_topk(emb, query_vec_id=q, k=10).collect()
        )
        assert batch.get(q, []) == single, q


def test_ann_index_topk_matches_in_dag_lsh(spark, tmp_path):
    """The persisted index changes WHERE the band rows live, not WHAT
    they contain: ann_index_topk over the written partitions must equal
    lsh_bucket_topk's in-DAG answer row for row, and the index read
    must touch at most LSH_BANDS partition directories."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "annidx")
    similarity.ann_index_write(emb, path)
    got = similarity.ann_index_topk(spark, path, emb, query_vec_id=0, k=10)
    want = similarity.lsh_bucket_topk(emb, query_vec_id=0, k=10).collect()
    assert [(r.vec_id, r.cosine) for r in got.collect()] == [
        (r.vec_id, r.cosine) for r in want
    ]


def test_band_coverage_report_matches_shard_assignment(spark):
    """The coverage report's numbers must be DERIVABLE from the actual
    shard assignment (same constants, same semantics): recompute every
    column from sharded_band_rows at a small max_bucket and compare."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    rep = {
        r.band_id: r
        for r in similarity.band_coverage_report(emb, max_bucket=3).collect()
    }
    per: dict = {}
    for r in similarity.sharded_band_rows(emb, max_bucket=3).collect():
        per.setdefault(r.band_id, {}).setdefault(r.band_key, []).append(r.shard)
    assert set(per) == set(rep)
    for band_id, buckets in per.items():
        row = rep[band_id]
        assert row.n_rows == sum(len(v) for v in buckets.values())
        assert row.n_buckets == len(buckets)
        assert row.n_hot_buckets == sum(
            1 for v in buckets.values() if len(v) > 3
        )
        assert row.n_shards == sum(1 + max(v) for v in buckets.values())
        spill = sum(sum(1 for s in v if s > 0) for v in buckets.values())
        assert row.spill_rows == spill
        assert abs(row.spill_fraction - round(spill / row.n_rows, 6)) < 1e-9
    # at least one band must actually shard at max_bucket=3, or the
    # test proves nothing
    assert any(r.n_hot_buckets > 0 for r in rep.values())


def test_ann_index_batch_matches_batch_lsh(spark, tmp_path):
    """Batch lookup over the persisted index must equal the in-DAG
    lsh_batch_topk per qid — the index relocates the band rows, it
    never changes the candidate semantics."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "annidx_b")
    similarity.ann_index_write(emb, path)
    queries = spark.createDataFrame([(q,) for q in range(4)], "qid long")
    got = {}
    for r in similarity.ann_index_batch_topk(spark, path, emb, queries).collect():
        got.setdefault(r.qid, []).append((r.vec_id, r.cosine))
    want = {}
    for r in similarity.lsh_batch_topk(emb, queries).collect():
        want.setdefault(r.qid, []).append((r.vec_id, r.cosine))
    assert got == want


def test_band_keys_py_matches_spark_banding(spark):
    """The driver-side Python band keys (the probe-pruning derivation,
    ADVICE r6) must be bit-identical to the Spark-computed banding for
    every vector — same planes, same left-to-right double sums, same
    sign convention. Checked over the whole sf0.001 corpus."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    spark_keys: dict = {}
    for r in (
        similarity.sharded_band_rows(emb)
        .select("vec_id", "band_id", "band_key")
        .collect()
    ):
        spark_keys.setdefault(r.vec_id, {})[r.band_id] = r.band_key
    rows = emb.select("vec_id", "embedding").collect()
    assert len(rows) > 0
    for r in rows:
        keys = similarity.band_keys_py(list(r.embedding))
        assert {b: k for b, k in enumerate(keys)} == spark_keys[r.vec_id], r.vec_id


def test_ivf_index_topk_probe_avoids_lists_scan(spark, tmp_path):
    """With the corpus table supplied, ivf_index_topk must answer
    identically to the lists-scan fallback while ranking cells against
    the literal query vector (ADVICE r6: the probe itself is pruned —
    only the _centroids file and the nprobe cid partitions are read)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivfidx")
    similarity.ivf_index_write(emb, path)
    got = similarity.ivf_index_topk(spark, path, query_vec_id=0, k=10, emb=emb)
    want = similarity.ivf_index_topk(spark, path, query_vec_id=0, k=10)
    assert [(r.vec_id, r.cosine) for r in got.collect()] == [
        (r.vec_id, r.cosine) for r in want.collect()
    ]


def test_neardup_against_index_matches_in_dag_twin(spark, tmp_path):
    """The persisted index relocates the corpus band rows; it must not
    change near-dup semantics. In-DAG twin built from the same split:
    corpus bands (bucket-capped over the corpus alone) joined to batch
    bands with the same agreement screen, verified with the same exact
    Jaccard."""
    from pyspark.sql import Window

    docs = load_table(spark, SF_SMALL, "documents")
    corpus = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    path = str(tmp_path / "mhidx_twin")
    dedup.minhash_index_write(corpus, path)
    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.neardup_against_index(spark, path, docs, batch).collect()
    )
    # in-DAG twin
    w = Window.partitionBy("band_id", "band_key")
    cb = (
        dedup._minhash_bands(dedup.minhash_signatures(corpus), carry_sigs=True)
        .withColumn("bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("bsz") <= dedup.MINHASH_MAX_BUCKET)
        .drop("bsz")
    )
    qb = dedup._minhash_bands(dedup.minhash_signatures(batch), carry_sigs=True)
    joined = cb.alias("c").join(qb.alias("q"), ["band_id", "band_key"])
    agree = sum(
        (F.col(f"c.sig_{i}") == F.col(f"q.sig_{i}")).cast("int")
        for i in range(dedup.NUM_HASHES)
    )
    pairs = (
        joined.filter(F.col("c.doc_id") != F.col("q.doc_id"))
        .filter(agree >= F.lit(dedup.MINHASH_MIN_AGREE))
        .select(F.col("c.doc_id").alias("doc_a"), F.col("q.doc_id").alias("doc_b"))
        .distinct()
    )
    want = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.pair_jaccard(docs, pairs, keep_zeros=False)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    )
    assert got == want and len(got) > 0


def test_ann_index_append_extends_buckets_without_rebanding(spark, tmp_path):
    """Incremental-index invariants: after append, (1) every vector of
    corpus ∪ batch has exactly LSH_BANDS rows in the index, (2) no
    (band, key, shard) group exceeds the cap, (3) shard continuation —
    within a bucket every shard below the deepest is exactly full, i.e.
    the batch topped up the corpus's last partial shard before opening
    new ones (a restarted rank would leave two partial shards)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    s = 3 * (n - 1) // 4
    path = str(tmp_path / "ann_incr")
    cap = 20  # small cap so sf0.001 buckets genuinely shard
    similarity.ann_index_write(emb.filter(F.col("vec_id") < s), path, max_bucket=cap)
    similarity.ann_index_append(
        spark, path, emb.filter(F.col("vec_id") >= s), max_bucket=cap
    )
    idx = spark.read.parquet(path)
    assert idx.count() == n * similarity.LSH_BANDS
    sizes = (
        idx.groupBy("band_id", "band_key", "shard")
        .count()
        .collect()
    )
    assert all(r["count"] <= cap for r in sizes)
    by_bucket: dict[tuple, dict[int, int]] = {}
    for r in sizes:
        by_bucket.setdefault((r.band_id, r.band_key), {})[r.shard] = r["count"]
    assert any(len(shards) > 1 for shards in by_bucket.values())  # non-vacuous
    for (band_id, band_key), shards in by_bucket.items():
        deepest = max(shards)
        assert sorted(shards) == list(range(deepest + 1)), (band_id, band_key)
        for sh, cnt in shards.items():
            if sh < deepest:
                assert cnt == cap, (band_id, band_key, sh, cnt)


def test_ann_index_append_serves_fresh_queries(spark, tmp_path):
    """A probe for a just-appended vector is answered from the index
    and its candidates span the frozen corpus — yesterday's index
    answers about today's data without a rebuild."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    s = 3 * (n - 1) // 4
    path = str(tmp_path / "ann_fresh")
    similarity.ann_index_write(emb.filter(F.col("vec_id") < s), path)
    similarity.ann_index_append(spark, path, emb.filter(F.col("vec_id") >= s))
    qid = n - 1
    rows = similarity.ann_index_topk(spark, path, emb, query_vec_id=qid, k=10).collect()
    assert rows, "appended query vector found no candidates"
    assert all(r.vec_id != qid for r in rows)
    assert any(r.vec_id < s for r in rows), "no corpus-side neighbor surfaced"


def test_semdedup_keep_rule_matches_independent_recompute(spark):
    """semdedup_keep's verdicts recomputed independently with numpy:
    a vector is dropped iff a lower-id member of its own cluster (and
    shard — trivially shard 0 at this cap) sits within eps cosine."""
    import numpy as np

    emb = load_table(spark, SF_SMALL, "embeddings")
    got = {r.vec_id: r for r in similarity.semdedup_keep(emb).collect()}
    cents = similarity.ivf_centroids(
        emb, similarity.IVF_NLIST, sample_mod=similarity.TRAIN_SAMPLE_MOD
    )
    assign = {r.vec_id: r.cid for r in similarity.ivf_assign(emb, cents).collect()}
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    assert set(got) == set(vecs)
    for vid, row in got.items():
        assert row.cid == assign[vid]
        has_lower_neighbor = False
        v = vecs[vid]
        for other, cid in assign.items():
            if cid != row.cid or other >= vid:
                continue
            u = vecs[other]
            cos = float(v @ u / (np.linalg.norm(v) * np.linalg.norm(u)))
            if cos >= similarity.SEMDEDUP_EPS:
                has_lower_neighbor = True
                break
        assert row.keep == (not has_lower_neighbor), vid


def test_ann_index_append_induction_over_sequential_batches(spark, tmp_path):
    """The streaming-ingest shape: THREE sequential appends (each
    micro-batch sees the counts left by the previous ones). The bucket
    invariants must hold at every step — every shard below a bucket's
    deepest is exactly full, so occupancy continuation composes."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    path = str(tmp_path / "ann_seq")
    cap = 20
    similarity.ann_index_write(emb.filter(F.col("vec_id") < 200), path, max_bucket=cap)
    for lo, hi in ((200, 300), (300, 400), (400, n)):
        similarity.ann_index_append(
            spark,
            path,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            max_bucket=cap,
        )
    idx = spark.read.parquet(path)
    assert idx.count() == n * similarity.LSH_BANDS
    sizes = idx.groupBy("band_id", "band_key", "shard").count().collect()
    assert all(r["count"] <= cap for r in sizes)
    by_bucket: dict[tuple, dict[int, int]] = {}
    for r in sizes:
        by_bucket.setdefault((r.band_id, r.band_key), {})[r.shard] = r["count"]
    for key, shards in by_bucket.items():
        deepest = max(shards)
        assert sorted(shards) == list(range(deepest + 1)), key
        assert all(cnt == cap for sh, cnt in shards.items() if sh < deepest), key


def test_ann_probe_survives_all_hot_buckets(spark, tmp_path):
    """The scale regression the probe rule must not have: when EVERY
    bucket exceeds the cap (here: cap=20 on ~31-member buckets — at
    production constants, any corpus past ~2^BAND_BITS·cap vectors), a
    bucket-count skip rule returns zero candidates for every query.
    Shard-0 probing must keep giving each query a bounded, non-empty
    candidate set: ≤ LSH_BANDS·cap candidates, all from shard 0."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    s = 3 * (n - 1) // 4
    path = str(tmp_path / "ann_hot")
    cap = 20
    similarity.ann_index_write(emb.filter(F.col("vec_id") < s), path, max_bucket=cap)
    # the regime is genuinely hot: most buckets sharded (sign-bit keys
    # are not perfectly uniform, so a rare key can stay under the cap)
    depths = (
        spark.read.parquet(path)
        .groupBy("band_id", "band_key")
        .agg(F.max("shard").alias("d"))
        .collect()
    )
    assert sum(1 for r in depths if r.d > 0) > len(depths) / 2
    batch = emb.filter(F.col("vec_id") >= s).limit(5)
    cands = similarity.ann_candidates_against_index(
        spark, path, batch, corpus_max_id=s - 1
    )
    per_q = {r["qid"]: r["cnt"] for r in
             cands.groupBy("qid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert len(per_q) == 5, "a query lost ALL candidates under hot buckets"
    assert all(0 < c <= similarity.LSH_BANDS * cap for c in per_q.values())


def test_ann_index_compact_restores_rebuild_order(spark, tmp_path):
    """The index lifecycle closes: build corpus index -> append batch ->
    compact. Afterwards the on-disk rows must EQUAL a from-scratch
    rebuild over the full corpus (the drift the parity report measures
    goes to zero), and only the hot partitions were rewritten."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    s = 3 * (n - 1) // 4
    cap = 20
    path = str(tmp_path / "ann_compact")
    similarity.ann_index_write(emb.filter(F.col("vec_id") < s), path, max_bucket=cap)
    similarity.ann_index_append(
        spark, path, emb.filter(F.col("vec_id") >= s), max_bucket=cap
    )
    rewritten = similarity.ann_index_compact(spark, path, max_bucket=cap)
    assert rewritten > 0  # sf0.001 at cap=20 genuinely has hot buckets
    got = sorted(
        (r.vec_id, r.band_id, r.band_key, r.shard)
        for r in spark.read.parquet(path).collect()
    )
    want = sorted(
        (r.vec_id, r.band_id, r.band_key, r.shard)
        for r in similarity.sharded_band_rows(emb, max_bucket=cap).collect()
    )
    assert got == want
    # idempotent: nothing is hot by count anymore? hot buckets remain
    # hot by SIZE (they are sharded), so a second compact rewrites them
    # again — but to the identical row set
    similarity.ann_index_compact(spark, path, max_bucket=cap)
    again = sorted(
        (r.vec_id, r.band_id, r.band_key, r.shard)
        for r in spark.read.parquet(path).collect()
    )
    assert again == want


def test_index_maintenance_policy_threshold_semantics(spark):
    """The report→verb policy table (r9) must be internally consistent:
    one row per tier, decision == the tier's verb exactly when its
    metric exceeds its pinned threshold, 'none' otherwise — and the
    LSH row's metric must equal the coverage report's own overall
    spill fraction (the policy consumes the report's number, it does
    not invent one)."""
    from mapreduce_itwiki_spark.plans import llm_pipeline as LP
    from mapreduce_itwiki_spark.plans.catalog import queries

    rows = {r.index_tier: r for r in queries()["index_maintenance_policy"](
        spark, SF_SMALL
    ).collect()}
    assert set(rows) == {"lsh", "ivf", "ivfpq", "lsh_ingest"}
    verbs = {
        "lsh": "retune_band_bits",
        "ivf": "retrain_ivf",
        "ivfpq": "retrain_pq",
        "lsh_ingest": "widen_probe",
    }
    for tier, r in rows.items():
        want = verbs[tier] if r.value > r.threshold else "none"
        assert r.decision == want, (tier, r)
    cov = similarity.band_coverage_report(
        load_table(spark, SF_SMALL, "embeddings"), max_bucket=LP._OCC_CAP
    ).collect()
    spill = round(sum(x.spill_rows for x in cov) / sum(x.n_rows for x in cov), 6)
    assert abs(rows["lsh"].value - spill) < 1e-9


def test_multiprobe_topk_superset_and_recall(spark, tmp_path):
    """Multi-probe candidates are a strict superset of single-probe
    candidates (own bucket+shard ⊂ probe set by construction), so
    per-query multi-probe recall@k is ≥ single-probe recall@k; and the
    probe honors the index's stored geometry (6-bit index probed with
    6-bit keys and their flips)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ann_mp")
    similarity.ann_index_write(emb, path, max_bucket=20, band_bits=6)
    exact = (
        similarity.with_cosine_to_query(
            emb.filter(F.col("vec_id") != 0), emb.filter(F.col("vec_id") == 0)
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )
    want = {r.vec_id for r in exact.collect()}
    single = {
        r.vec_id
        for r in similarity.ann_index_topk(
            spark, path, emb, query_vec_id=0, k=10
        ).collect()
    }
    multi = {
        r.vec_id
        for r in similarity.ann_index_multiprobe_topk(
            spark, path, emb, query_vec_id=0, k=10, radius=1
        ).collect()
    }
    assert len(multi & want) >= len(single & want)
    # the key property (ADVICE r9 — the old form was tautological):
    # the single-probe CANDIDATE set is a subset of the multi-probe
    # one (own bucket+shard ⊂ probe set by construction). k beyond any
    # candidate count makes the top-k return the whole candidate set.
    single_cand = {
        r.vec_id
        for r in similarity.ann_index_topk(
            spark, path, emb, query_vec_id=0, k=10**6
        ).collect()
    }
    multi_cand = {
        r.vec_id
        for r in similarity.ann_index_multiprobe_topk(
            spark, path, emb, query_vec_id=0, k=10**6, radius=1
        ).collect()
    }
    assert single_cand <= multi_cand
    assert multi <= multi_cand and single <= single_cand
    # neighbor generation: w+1 keys at radius 1, w(w-1)/2 more at 2
    ks = similarity.neighbor_band_keys("0101", radius=1)
    assert len(ks) == 5 and "0101" in ks and "1101" in ks
    assert len(similarity.neighbor_band_keys("0101", radius=2)) == 1 + 4 + 6


def test_ivfpq_index_retrain_equals_rebuild(spark, tmp_path):
    """Retraining an append-maintained IVF-PQ index must reproduce a
    from-scratch build over the current membership byte-for-byte (as
    row sets) — centroids, codebooks, codes, meta — in BOTH coding
    modes (VERDICT r8 #5): deterministic md5-coin trainings over the
    same rows give the same quantizers, hence the same codes."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    s = 3 * (n - 1) // 4
    for mode in (False, True):
        inc = str(tmp_path / f"ivfpq_inc_{mode}")
        similarity.ivfpq_index_write(
            emb.filter(F.col("vec_id") < s), inc, by_residual=mode
        )
        similarity.ivfpq_index_append(
            spark, inc, emb.filter(F.col("vec_id") >= s)
        )
        similarity.ivfpq_index_retrain(spark, inc, emb)
        ref = str(tmp_path / f"ivfpq_ref_{mode}")
        similarity.ivfpq_index_write(emb, ref, by_residual=mode)
        for part in ("codes", "_centroids", "_codebooks", "_meta"):
            got = sorted(
                map(str, spark.read.parquet(f"{inc}/{part}").collect())
            )
            want = sorted(
                map(str, spark.read.parquet(f"{ref}/{part}").collect())
            )
            assert got == want, f"{part} differs post-retrain ({mode=})"


def test_auto_occupancy_geometry_measured_choice(spark, tmp_path):
    """band_bits="auto_occupancy" sizes from MEASURED spill (VERDICT
    r8 #1): with a tiny cap the driver-scale clustered corpus needs
    more bits than the uniform count formula grants, the chosen width
    meets the target (or honestly tops out at the grid max with the
    trail saying by how much), the sidecar records the choice, and a
    probe against the index hashes at the stored width."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    cap = 20
    chosen = similarity.choose_band_bits_occupancy(emb, max_bucket=cap)
    uniform = similarity.auto_band_bits(emb.count(), cap)
    trail = {
        int(r.band_bits): float(r.spill_fraction)
        for r in similarity.occupancy_spill_trail(emb, max_bucket=cap).collect()
    }
    assert set(trail) == set(similarity.OCCUPANCY_GRID)
    # clustered corpus: measured spill at the uniform choice exceeds
    # the target — exactly the gap the occupancy pass exists to close
    assert trail[min(similarity.OCCUPANCY_GRID, key=lambda w: abs(w - uniform))] >= 0
    if chosen != max(similarity.OCCUPANCY_GRID):
        assert trail[chosen] <= similarity.OCCUPANCY_TARGET_SPILL
        smaller = [w for w in similarity.OCCUPANCY_GRID if w < chosen]
        assert all(
            trail[w] > similarity.OCCUPANCY_TARGET_SPILL for w in smaller
        )
    path = str(tmp_path / "ann_occ")
    similarity.ann_index_write(
        emb, path, max_bucket=cap, band_bits="auto_occupancy"
    )
    assert similarity.index_geometry(spark, path) == (chosen, cap)
    got = similarity.ann_index_topk(spark, path, emb, query_vec_id=0, k=5)
    # probe hashed at the stored width == in-DAG banding at that width
    capped = similarity.sharded_band_rows(
        emb, max_bucket=cap, band_bits=chosen
    )
    qb = capped.filter(F.col("vec_id") == 0).select(
        "band_id", "band_key", "shard"
    )
    cand = (
        capped.join(qb, ["band_id", "band_key", "shard"])
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
        .distinct()
    )
    want = (
        similarity.with_cosine_to_query(
            emb.join(cand, "vec_id", "left_semi"),
            emb.filter(F.col("vec_id") == 0),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
    )
    assert [(r.vec_id, r.cosine) for r in got.collect()] == [
        (r.vec_id, r.cosine) for r in want.collect()
    ]


def test_occupancy_trail_sampled_estimator(spark):
    """The sampled trail is deterministic (md5 coin) and its bucket
    estimates scale by mod — hot buckets (the spill drivers) are
    detected from the 1-in-mod sample alone."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    a = similarity.occupancy_spill_trail(
        emb, max_bucket=20, sample_mod=2
    ).collect()
    b = similarity.occupancy_spill_trail(
        emb, max_bucket=20, sample_mod=2
    ).collect()
    key = lambda rows: sorted(
        (r.band_bits, r.n_rows, r.spill_rows) for r in rows
    )
    assert key(a) == key(b)
    full = {
        int(r.band_bits): float(r.spill_fraction)
        for r in similarity.occupancy_spill_trail(emb, max_bucket=20).collect()
    }
    est = {int(r.band_bits): float(r.spill_fraction) for r in a}
    # the estimator tracks the real curve well enough to make the same
    # kind of decision: within 0.15 absolute at every grid width
    assert all(abs(full[w] - est[w]) < 0.15 for w in full)


def test_ann_index_compact_preserves_tuned_geometry(spark, tmp_path):
    """Compacting a NON-default-geometry index must keep its geometry
    authoritative (VERDICT r8 #3): compact rewrites only hot pkey
    partitions via dynamic partition overwrite, so the ``_geometry``
    sidecar written at build time survives untouched — a 6-bit index
    stays 6-bit, and the compacted rows equal a 6-bit rebuild."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    s = 3 * (n - 1) // 4
    cap, bits = 20, 6
    path = str(tmp_path / "ann_compact6")
    similarity.ann_index_write(
        emb.filter(F.col("vec_id") < s), path, max_bucket=cap, band_bits=bits
    )
    similarity.ann_index_append(
        spark, path, emb.filter(F.col("vec_id") >= s), max_bucket=cap
    )
    similarity.ann_index_compact(spark, path, max_bucket=cap)
    similarity._GEOMETRY_CACHE.pop(
        __import__("os").path.abspath(path), None
    )  # force the sidecar read, not the memoized tuple
    assert similarity.index_geometry(spark, path) == (bits, cap)
    got = sorted(
        (r.vec_id, r.band_id, r.band_key, r.shard)
        for r in spark.read.parquet(path).collect()
    )
    want = sorted(
        (r.vec_id, r.band_id, r.band_key, r.shard)
        for r in similarity.sharded_band_rows(
            emb, max_bucket=cap, band_bits=bits
        ).collect()
    )
    assert got == want


def test_ivfpq_index_matches_in_dag_both_modes(spark, tmp_path):
    """The persisted IVF-PQ index must be result-identical to the
    in-DAG ivfpq_topk in BOTH coding modes (raw and residual): the
    per-vector encode is deterministic, and the stored dense code is a
    per-subspace bijection of the codebook cid, so ADC sums — and hence
    the shortlist and the exact rerank — agree row for row. Also pins
    the storage contract: one row per vector, PQ_M TINYINT codes, no
    embedding column in the code table, and the _meta mode round-trip."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    for res in (False, True):
        path = str(tmp_path / f"ivfpq_{int(res)}")
        similarity.ivfpq_index_write(emb, path, by_residual=res)
        got = [
            (r.vec_id, r.cosine)
            for r in similarity.ivfpq_index_topk(
                spark, path, emb, query_vec_id=0, k=10
            ).collect()
        ]
        want = [
            (r.vec_id, r.cosine)
            for r in similarity.ivfpq_topk(
                emb, query_vec_id=0, k=10, by_residual=res
            ).collect()
        ]
        assert got == want and len(got) == 10, (res, got, want)
        codes = spark.read.parquet(f"{path}/codes")
        assert codes.count() == emb.count()
        ctype = dict(codes.dtypes)["codes"]
        assert ctype == "array<tinyint>", ctype
        assert "embedding" not in codes.columns
        sizes = codes.select(F.size("codes").alias("n")).distinct().collect()
        assert [r.n for r in sizes] == [similarity.PQ_M]
        meta = spark.read.parquet(f"{path}/_meta").take(1)[0]
        assert bool(meta.by_residual) is res


def test_ivfpq_index_topk_absent_query_is_empty(spark, tmp_path):
    """A query vec_id not in the corpus yields an empty (not erroring)
    result — the same contract as ann_index_topk's absent-query
    branch."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivfpq_absent")
    similarity.ivfpq_index_write(emb, path)
    out = similarity.ivfpq_index_topk(spark, path, emb, query_vec_id=10**9, k=10)
    assert out.count() == 0


def test_auto_band_bits_scales_with_corpus(spark):
    """The corpus-derived geometry formula: default below the
    ~2^BAND_BITS·cap regime, then ceil(log2(n/cap)) — monotone,
    and sized so a uniform corpus's expected bucket fits the cap."""
    cap = similarity.MAX_BUCKET
    assert similarity.auto_band_bits(100) == similarity.BAND_BITS
    assert similarity.auto_band_bits(cap * 16) == similarity.BAND_BITS
    assert similarity.auto_band_bits(cap * 17) == 5
    assert similarity.auto_band_bits(10**6) == 8
    assert similarity.auto_band_bits(10**9) == 18
    for n in (10**5, 10**7, 10**9):
        bits = similarity.auto_band_bits(n)
        assert n / 2**bits <= similarity.MAX_BUCKET


def test_tuned_index_probes_with_stored_geometry(spark, tmp_path):
    """An index written at band_bits=6 must be probed at 6 bits even
    though the module default is 4 (the _geometry sidecar, VERDICT r7
    #2): the result equals the in-DAG twin recomputed at the tuned
    width, and a mis-probed index would return nothing at all."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "tuned6")
    similarity.ann_index_write(emb, path, band_bits=6)
    assert similarity.index_geometry(spark, path) == (6, similarity.MAX_BUCKET)
    got = [
        (r.vec_id, r.cosine)
        for r in similarity.ann_index_topk(
            spark, path, emb, query_vec_id=0, k=10
        ).collect()
    ]
    assert len(got) > 0
    # in-DAG twin: candidates from the tuned sharded banding
    capped = similarity.sharded_band_rows(emb, band_bits=6)
    qb = capped.filter(F.col("vec_id") == 0).select(
        "band_id", "band_key", "shard"
    )
    cand = (
        capped.join(qb, ["band_id", "band_key", "shard"])
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
        .distinct()
    )
    scored = similarity.with_cosine_to_query(
        emb.join(cand, "vec_id", "left_semi"), emb.filter(F.col("vec_id") == 0)
    )
    want = [
        (r.vec_id, r.cosine)
        for r in scored.orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        ).limit(10).collect()
    ]
    assert got == want


def test_append_respects_stored_geometry(spark, tmp_path):
    """ann_index_append must band the batch with the INDEX's stored
    bits: appending to a 6-bit index produces only 6-char band keys and
    preserves the per-shard cap invariant."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "tuned_app")
    similarity.ann_index_write(emb.filter(F.col("vec_id") < 400), path, band_bits=6)
    similarity.ann_index_append(spark, path, emb.filter(F.col("vec_id") >= 400))
    idx = spark.read.parquet(path)
    lens = [r.l for r in idx.select(F.length("band_key").alias("l")).distinct().collect()]
    assert lens == [6], lens
    per_shard = (
        idx.groupBy("band_id", "band_key", "shard").count().agg(F.max("count"))
    ).collect()[0][0]
    assert per_shard <= similarity.MAX_BUCKET


def test_ivf_retrain_equals_rebuild(spark, tmp_path):
    """ivf_index_retrain must be REBUILD-EQUAL: after build(corpus) +
    append(batch) + retrain, the on-disk centroids and lists equal a
    from-scratch ivf_index_write over corpus ∪ batch (deterministic
    sampled training ⇒ same centroids ⇒ same assignment)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    p1 = str(tmp_path / "ivf_lifecycle")
    similarity.ivf_index_write(emb.filter(F.col("vec_id") < 400), p1)
    similarity.ivf_index_append(spark, p1, emb.filter(F.col("vec_id") >= 400))
    similarity.ivf_index_retrain(spark, p1)
    p2 = str(tmp_path / "ivf_rebuild")
    similarity.ivf_index_write(emb, p2)
    got_c = sorted(
        (r.cid, tuple(r.cv))
        for r in spark.read.parquet(f"{p1}/_centroids").collect()
    )
    want_c = sorted(
        (r.cid, tuple(r.cv))
        for r in spark.read.parquet(f"{p2}/_centroids").collect()
    )
    assert got_c == want_c
    got_l = sorted(
        (r.vec_id, r.cid) for r in spark.read.parquet(f"{p1}/lists").collect()
    )
    want_l = sorted(
        (r.vec_id, r.cid) for r in spark.read.parquet(f"{p2}/lists").collect()
    )
    assert got_l == want_l and len(got_l) == emb.count()


def test_ivf_balance_report_covers_dead_cells(spark, tmp_path):
    """The balance report keys on the CENTROID table, so a cell no
    vector maps to still appears with occupancy 0 — the retrain
    trigger an inner join would hide. Also pins Σ occupancy = 1 and
    mean skew = 1 (the uniform-ideal normalization)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf_bal")
    similarity.ivf_index_write(emb, path)
    rep = similarity.ivf_balance_report(spark, path).collect()
    nlist = spark.read.parquet(f"{path}/_centroids").count()
    assert len(rep) == nlist
    assert abs(sum(r.occupancy_fraction for r in rep) - 1.0) < 1e-4
    assert abs(sum(r.skew for r in rep) / nlist - 1.0) < 1e-4
    assert all(r.n_vectors >= 0 for r in rep)


def test_probe_coverage_counts_match_probe_path(spark, tmp_path):
    """The report must measure EXACTLY what the probe excludes: at the
    same cap, each query's n_candidates equals the candidate count
    ann_candidates_against_index actually produces, and uncapped ≥
    capped with the fraction consistent."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "probecov")
    similarity.ann_index_write(emb.filter(F.col("vec_id") < 400), path)
    batch = emb.filter(F.col("vec_id") >= 400)
    cap = 8
    rep = {
        r.qid: r
        for r in similarity.probe_coverage_report(
            spark, path, batch, probe_cap=cap
        ).collect()
    }
    got = {
        r.qid: r.n
        for r in similarity.ann_candidates_against_index(
            spark, path, batch, probe_cap=cap
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) <= set(rep)
    for qid, r in rep.items():
        assert r.n_candidates == got.get(qid, 0), (qid, r)
        assert r.n_candidates_uncapped == r.n_candidates + r.n_capped_out
    assert any(r.n_capped_out > 0 for r in rep.values())  # non-vacuous


def test_ivfpq_append_freezes_corpus_codes_and_encodes_batch(spark, tmp_path):
    """ivfpq_index_append must (a) leave every corpus code row
    byte-identical, (b) encode the batch with the STORED frozen
    codebooks — pinned by re-deriving the batch codes from the
    sidecars independently — and (c) keep one row per vector with the
    PQ_M TINYINT shape."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivfpq_incr")
    corpus = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    similarity.ivfpq_index_write(corpus, path)
    before = {
        r.vec_id: (r.cid, tuple(r.codes))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    similarity.ivfpq_index_append(spark, path, batch)
    after = {
        r.vec_id: (r.cid, tuple(r.codes))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    assert len(after) == emb.count()
    for vid, row in before.items():
        assert after[vid] == row  # corpus rows frozen
    # batch codes equal an independent frozen-book encode
    books = spark.read.parquet(f"{path}/_codebooks")
    sub = similarity._pq_sub_rows(batch.select("vec_id", "embedding"))
    enc = (
        sub.join(F.broadcast(books), "s")
        .select(
            "vec_id", "s", "code",
            similarity.sq_dist(F.col("sv"), F.col("cv")).alias("d"),
            "cid",
        )
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("d", "cid", "code")).alias("m"))
        .select("vec_id", "s", F.col("m.code").alias("code"))
    )
    want = {
        r.vec_id: tuple(x.code for x in sorted(r.cs, key=lambda x: x.s))
        for r in enc.groupBy("vec_id")
        .agg(F.collect_list(F.struct("s", "code")).alias("cs"))
        .collect()
    }
    for vid, codes in want.items():
        assert after[vid][1] == codes, vid


def test_auto_nlist_scales_with_corpus(spark):
    """The cap-driven cell-count floor: default below MAX_BUCKET·8
    rows, then ceil(n/cap) so no inverted list outgrows one pairwise
    task."""
    cap = similarity.MAX_BUCKET
    assert similarity.auto_nlist(100) == similarity.IVF_NLIST
    assert similarity.auto_nlist(cap * 8) == similarity.IVF_NLIST
    assert similarity.auto_nlist(cap * 9) == 9
    assert similarity.auto_nlist(10**6) == 245
    for n in (10**5, 10**6, 10**8):
        assert n / similarity.auto_nlist(n) <= cap


def test_ivf_centroid_grid_matches_ivf_centroids(spark):
    """The one-pass grid training must reproduce ivf_centroids EXACTLY
    at every candidate width, in both training modes — the nested-seed
    claim ann_ivf_occupancy_plan's oracle rests on (r10)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    for mode in (similarity.TRAIN_SAMPLE_MOD, None):
        grid = {
            (int(r.nlist), int(r.cid)): tuple(r.cv)
            for r in similarity.ivf_centroid_grid(
                emb, sample_mod=mode
            ).collect()
        }
        for w in similarity.IVF_NLIST_GRID:
            solo = {
                (w, int(r.cid)): tuple(r.cv)
                for r in similarity.ivf_centroids(
                    emb, w, sample_mod=mode
                ).collect()
            }
            got = {k: v for k, v in grid.items() if k[0] == w}
            assert got == solo, (mode, w)


def test_choose_nlist_occupancy_properties(spark):
    """Chooser: smallest grid width under the spill target; grid max
    when none qualifies; loud ValueError on an empty corpus (the
    choose_band_bits_occupancy contract, ADVICE r9)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    trail = {
        int(r.nlist): float(r.spill_fraction)
        for r in similarity.ivf_occupancy_trail(emb, max_bucket=64).collect()
    }
    want = next(
        (w for w in sorted(similarity.IVF_NLIST_GRID) if trail[w] <= 0.35),
        max(similarity.IVF_NLIST_GRID),
    )
    assert similarity.choose_nlist_occupancy(emb, max_bucket=64) == want
    # a cap of 1 makes every width fail → the honest grid-max floor
    assert similarity.choose_nlist_occupancy(emb, max_bucket=1) == max(
        similarity.IVF_NLIST_GRID
    )
    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="occupancy trail is empty"):
        similarity.choose_nlist_occupancy(empty)
    with pytest.raises(ValueError, match="occupancy trail is empty"):
        similarity.choose_band_bits_occupancy(empty)


def test_ivf_index_auto_occupancy_lifecycle(spark, tmp_path):
    """ivf_index_write(nlist='auto_occupancy') persists the MEASURED
    nlist in _meta, and ivf_index_retrain(remeasure_nlist=True)
    re-measures over current membership — the retrain_ivf policy
    verb's full form (VERDICT r9 #5)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf_auto")
    similarity.ivf_index_write(
        emb, path, nlist="auto_occupancy", occupancy_max_bucket=64
    )
    meta = spark.read.parquet(f"{path}/_meta").take(1)[0]
    want = similarity.choose_nlist_occupancy(emb, max_bucket=64)
    assert int(meta.nlist) == want
    n_cents = spark.read.parquet(f"{path}/_centroids").count()
    assert n_cents == want
    # undersized rebuild, then remeasured retrain returns to the
    # measured geometry
    similarity.ivf_index_write(emb, path, nlist=min(similarity.IVF_NLIST_GRID))
    similarity.ivf_index_retrain(
        spark, path, remeasure_nlist=True, occupancy_max_bucket=64
    )
    meta2 = spark.read.parquet(f"{path}/_meta").take(1)[0]
    assert int(meta2.nlist) == want


def test_auto_probe_sample_mod_budget_bound():
    """The derived mod is a HARD worst-case bound: sampled queries ×
    LSH_BANDS × max_bucket never exceeds the budget (expected count
    batch/mod; the geometric per-query worst case is the contract)."""
    B = similarity.MONITOR_ROW_BUDGET
    for batch, cap in ((0, 4096), (1, 4096), (125, 4096), (10**7, 4096),
                       (10**9, 128), (3, 1)):
        mod = similarity.auto_probe_sample_mod(batch, max_bucket=cap)
        assert mod >= 1
        worst = batch * similarity.LSH_BANDS * cap
        assert worst / mod <= B or mod == 1 and worst <= B, (batch, cap, mod)
        if mod > 1:  # never over-sample: mod-1 would blow the budget
            assert worst / (mod - 1) > B


def test_candidates_radius_validation_and_supersets(spark, tmp_path):
    """radius outside {0, 1, 2} is rejected at function entry (ADVICE
    r9: a negative radius must never be silently treated as 0), and
    the candidate sets NEST: radius 0 ⊆ 1 ⊆ 2 (each probe set is a
    strict superset by construction)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ann_rv")
    similarity.ann_index_write(emb, path, max_bucket=20, band_bits=6)
    for bad in (-1, 3):
        with pytest.raises(ValueError, match="radius 0, 1 or 2"):
            similarity.ann_candidates_against_index(
                spark, path, emb, radius=bad
            )
    batch = emb.filter(F.col("vec_id") >= 400)
    sets = {}
    for r in (0, 1, 2):
        sets[r] = {
            (x.qid, x.cand_vec_id)
            for x in similarity.ann_candidates_against_index(
                spark, path, batch, corpus_max_id=399, radius=r
            ).collect()
        }
    assert sets[0] <= sets[1] <= sets[2]
    assert len(sets[2]) > len(sets[1]) > len(sets[0])


def test_ivfpq_retrain_replays_stored_pq_geometry(spark, tmp_path):
    """An IVFPQ index built at NON-default PQ geometry must retrain at
    its STORED pq_m/pq_sub/pq_codes (ADVICE r9): meta and code widths
    survive a retrain even though the module constants differ."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivfpq_geo")
    similarity.ivfpq_index_write(emb, path, pq_m=4, pq_sub=16, pq_codes=4)
    similarity.ivfpq_index_retrain(spark, path, emb)
    meta = spark.read.parquet(f"{path}/_meta").take(1)[0]
    assert (int(meta.pq_m), int(meta.pq_sub), int(meta.pq_codes)) == (4, 16, 4)
    row = spark.read.parquet(f"{path}/codes").take(1)[0]
    assert len(row.codes) == 4  # pq_m code bytes, not the module PQ_M


def test_ivfpq_retrain_remeasure_nlist(spark, tmp_path):
    """ivfpq_index_retrain(remeasure_nlist=True): the coarse cell
    count is re-measured over current membership (the IVF-tier rule
    applied to the compressed tier, r10) while PQ geometry still
    replays from _meta."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivfpq_rm")
    similarity.ivfpq_index_write(emb, path, nlist=4)
    similarity.ivfpq_index_retrain(
        spark, path, emb, remeasure_nlist=True, occupancy_max_bucket=64
    )
    want = similarity.choose_nlist_occupancy(emb, max_bucket=64)
    meta = spark.read.parquet(f"{path}/_meta").take(1)[0]
    assert int(meta.nlist) == want != 4
    assert spark.read.parquet(f"{path}/_centroids").count() == want
    assert (int(meta.pq_m), int(meta.pq_sub)) == (
        similarity.PQ_M,
        similarity.PQ_SUB,
    )


def test_weighted_median_sharded_equals_unsharded(spark):
    """weighted_median_price_sharded is bit-identical to the global
    cum-weight rule: the price bucketization is monotone in the window
    order, so carry-in + within-bucket cumsum equals the global cumsum
    at every row of the chosen bucket (the shared oracle proves the
    same against DuckDB; this pins the Spark twins against each other,
    including the exact total_weight_cents)."""
    from mapreduce_itwiki_spark.plans import catalog

    qs = catalog.queries()
    for sf in (SF_SMALL, SF_ORACLE):
        a = sorted(tuple(r) for r in qs["weighted_median_price"](spark, sf).collect())
        b = sorted(
            tuple(r)
            for r in qs["weighted_median_price_sharded"](spark, sf).collect()
        )
        assert a == b and len(a) == 3


def test_sharded_twins_on_adversarial_data(spark, tmp_path):
    """The sharded twins must equal their global-rule originals on data
    the fixed testdata can't produce: prices exactly ON bucket
    boundaries, runs of equal prices straddling the half-weight point,
    2*cw == tw landing exactly on a row, events at identical
    timestamps, and interval ends aligned to the hour-bucket edges.
    Bucket monotonicity proves equality; this pins it against
    regressions in the carry-in / tie-break plumbing."""
    import datetime

    from mapreduce_itwiki_spark.plans import catalog

    qs = catalog.queries()

    # --- weighted median: boundary + tie torture table -------------
    rows = []
    # flag A: every price a multiple of $100 (bucket boundary), equal
    # prices repeated, weights chosen so 2*cw == tw exactly mid-run
    for i, (price, qty) in enumerate(
        [(100.0, 1.0), (100.0, 1.0), (200.0, 2.0), (300.0, 4.0), (300.0, 4.0)]
    ):
        rows.append(("A", price, i + 1, 1, qty))
    # flag B: single row; flag C: all rows one price, huge weights
    rows.append(("B", 12345.67, 100, 1, 7.25))
    for i in range(6):
        rows.append(("C", 9999.99, 200 + i, 1, 50.0))
    # flag E: 2*cw == tw EXACTLY on the first row (the >= knife edge,
    # hit in both the row rule and the bucket-choice rule)
    rows.append(("E", 100.0, 500, 1, 1.0))
    rows.append(("E", 200.0, 501, 1, 1.0))
    # flag D: seeded pseudo-random grid with many exact repeats
    for i in range(400):
        price = [100.0, 150.0, 199.99, 200.0, 200.01, 5000.0][(i * 7) % 6]
        qty = [0.5, 1.0, 2.5, 10.0][(i * 13) % 4]
        rows.append(("D", price, 1000 + i, (i % 3) + 1, qty))
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_extendedprice double, l_orderkey long, "
        "l_linenumber int, l_quantity double",
    )
    li.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    sf = str(tmp_path)
    a = sorted(tuple(r) for r in qs["weighted_median_price"](spark, sf).collect())
    b = sorted(
        tuple(r) for r in qs["weighted_median_price_sharded"](spark, sf).collect()
    )
    assert a == b and len(a) == 5
    assert [r for r in a if r[0] == "E"][0][1] == 100.0

    # --- sweep line: tie + bucket-edge torture events --------------
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    ev = []
    eid = 0

    def add(minute_offset, etype, n=1):
        nonlocal eid
        for _ in range(n):
            eid += 1
            ev.append(
                (eid, base + datetime.timedelta(minutes=minute_offset), eid % 7, etype, 1.0, "{}")
            )

    add(0, "x", 5)          # 5 intervals opening at the exact hour edge
    add(30, "x", 3)         # opening exactly when the first five END
    add(30.0, "x")          # more ties at the same boundary instant
    add(90, "x", 4)         # next bucket, ends at 120 = bucket edge
    add(0, "y")             # singleton type
    for i in range(200):    # seeded grid: 15-min lattice → massive ties
        add(15 * ((i * 11) % 16), "z")
    edf = spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    edf.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    c = sorted(
        tuple(r) for r in qs["max_concurrent_sessions"](spark, sf).collect()
    )
    d = sorted(
        tuple(r)
        for r in qs["max_concurrent_sessions_sharded"](spark, sf).collect()
    )
    assert c == d and len(c) == 3


# --- r10 optimization internals -------------------------------------------


def test_values_df_equals_createdataframe(spark):
    """values_df (the JVM inline-table replacement for list-based
    createDataFrame — optimization r10) must be value- and
    type-identical to what it replaced, across every literal shape the
    call sites use: NULLs, strings needing escapes, booleans, and
    array<double> with repr-exact floats."""
    from mapreduce_itwiki_spark.functions.inline import values_df

    cases = [
        ([(8, None)], "nlist int, sample_mod int"),
        ([(None, "__none__", -1)], "qid long, pkey string, shard long"),
        ([(1, "0_0101", 0), (2, "1_1110", 3)], "qid long, pkey string, shard long"),
        ([(0, [1.5, -2.25e-17, 0.1])], "s int, qsv array<double>"),
        ([("it's a \\ test",)], "t string"),
    ]
    for rows, schema in cases:
        got = [tuple(r) for r in values_df(spark, rows, schema).collect()]
        want = [tuple(r) for r in spark.createDataFrame(rows, schema).collect()]
        assert got == want, (schema, got, want)
        assert (
            values_df(spark, rows, schema).schema.simpleString()
            == spark.createDataFrame(rows, schema).schema.simpleString()
        )
    assert values_df(spark, [], "a int, b string").count() == 0


def test_occupancy_band_trail_matches_coverage_report(spark):
    """occupancy_band_trail's per-width slices (the one-pass grid
    measurement ann_lsh_coverage_occupancy now reads — optimization
    r10) must equal band_coverage_report run independently at each
    width: same planes by the widest-prefix identity, same
    aggregates."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    cap = 8
    trail = {
        (r.band_bits, r.band_id): r
        for r in similarity.occupancy_band_trail(
            emb, widths=(4, 6), max_bucket=cap
        ).collect()
    }
    for w in (4, 6):
        for r in similarity.band_coverage_report(
            emb, max_bucket=cap, band_bits=w
        ).collect():
            t = trail[(w, r.band_id)]
            assert (
                t.n_rows,
                t.n_buckets,
                t.n_hot_buckets,
                t.n_shards,
                t.spill_rows,
                t.spill_fraction,
            ) == (
                r.n_rows,
                r.n_buckets,
                r.n_hot_buckets,
                r.n_shards,
                r.spill_rows,
                r.spill_fraction,
            ), (w, r.band_id)


def test_ivf_assign_matches_window_argmin(spark):
    """ivf_assign's MIN-over-(d, cid)-struct argmin (optimization r10)
    must reproduce the row_number-window form it replaced, including
    the cid tie-break."""
    from pyspark.sql import Window

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = similarity.ivf_centroids(emb, 4, sample_mod=4).localCheckpoint()
    got = {
        r.vec_id: r.cid for r in similarity.ivf_assign(emb, cents).collect()
    }
    w = Window.partitionBy("vec_id").orderBy("d", "cid")
    from mapreduce_itwiki_spark.functions import vectors

    want = {
        r.vec_id: r.cid
        for r in (
            emb.select(
                "vec_id", vectors.as_double(F.col("embedding")).alias("v")
            )
            .crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                "cid",
                similarity.sq_dist(F.col("v"), F.col("cv")).alias("d"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        ).collect()
    }
    assert got == want


def test_salted_by_partition_preserves_rows_and_salt_width(spark, tmp_path):
    """salted_by_partition (optimization r11, guide §2.5: skew-safe
    clustered writes) must (a) write exactly the same rows into exactly
    the same partition directories as the unsalted repartition form,
    (b) derive the salt deterministically (pmod(xxhash64(salt_src), k)
    — never rand(), SPARK-38388), and (c) size k to
    defaultParallelism // n_dirs so a wide-enough n_dirs degenerates to
    the unsalted single-task-per-value clustering."""
    from mapreduce_itwiki_spark.functions.par import salted_by_partition

    df = spark.range(0, 400).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).alias("cid"),
        (F.col("id") * 7).alias("payload"),
    )
    p_salted = str(tmp_path / "salted")
    p_plain = str(tmp_path / "plain")
    salted_by_partition(df, "cid", "vec_id", n_dirs=1).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(p_salted)
    df.repartition(F.col("cid")).write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(p_plain)
    got = {tuple(r) for r in spark.read.parquet(p_salted).collect()}
    want = {tuple(r) for r in spark.read.parquet(p_plain).collect()}
    assert got == want and len(got) == 400
    import os

    dirs = lambda p: sorted(  # noqa: E731
        d for d in os.listdir(p) if d.startswith("cid=")
    )
    assert dirs(p_salted) == dirs(p_plain)
    # salt width: one value per directory gets ≤ k writer tasks — with
    # n_dirs ≥ parallelism, k = 1 and every directory is 1 file, the
    # unsalted layout
    par = spark.sparkContext.defaultParallelism
    wide = str(tmp_path / "wide")
    salted_by_partition(df, "cid", "vec_id", n_dirs=max(par, 4)).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(wide)
    for d in dirs(wide):
        files = [
            f
            for f in os.listdir(os.path.join(wide, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)


def test_pq_encode_rows_and_codes_equal_two_exchange_forms(spark):
    """_pq_encode_rows / _pq_encode_codes (optimization r11, guide
    §2.4: the one-exchange PQ encode) must be row-identical to the
    two-shuffle shapes they replaced — the per-(vec_id, s) MIN(STRUCT)
    argmin + (for codes) the array_sort(collect_list) assembly."""
    from mapreduce_itwiki_spark.operators.similarity import (
        PQ_M,
        _pq_encode_codes,
        _pq_encode_rows,
        _pq_sub_rows,
        pq_codebooks,
        sq_dist,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    sub = _pq_sub_rows(emb.select("vec_id", "embedding"))
    books = pq_codebooks(sub, sample_mod=4).localCheckpoint()
    scored = sub.join(F.broadcast(books), "s").select(
        "vec_id", "s", "cid", sq_dist(F.col("sv"), F.col("cv")).alias("d")
    )
    got = {
        (r.vec_id, r.s): r.cid for r in _pq_encode_rows(scored).collect()
    }
    want = {
        (r.vec_id, r.s): r.cid
        for r in (
            scored.groupBy("vec_id", "s")
            .agg(F.min(F.struct("d", "cid")).alias("m"))
            .select("vec_id", "s", F.col("m.cid").alias("cid"))
        ).collect()
    }
    assert got == want and len(got) > 0
    from pyspark.sql import Window

    wb = Window.partitionBy("s").orderBy("cid")
    books_disk = books.withColumn(
        "code", (F.row_number().over(wb) - 1).cast("tinyint")
    )
    got_codes = {
        r.vec_id: list(r.codes)
        for r in _pq_encode_codes(sub, books_disk, PQ_M).collect()
    }
    enc_old = (
        sub.join(F.broadcast(books_disk), "s")
        .select(
            "vec_id",
            "s",
            "code",
            "cid",
            sq_dist(F.col("sv"), F.col("cv")).alias("d"),
        )
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("d", "cid", "code")).alias("m"))
        .select("vec_id", "s", F.col("m.code").alias("code"))
    )
    want_codes = {
        r.vec_id: list(r.codes)
        for r in enc_old.groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda st: st.getField("code"),
            ).alias("codes")
        )
        .collect()
    }
    assert got_codes == want_codes and len(got_codes) > 0
