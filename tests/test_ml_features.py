"""Plain-Python / numpy cross-checks for the feature-engineering and
model-fitting operators (plans/ml_features.py) — the same independent-
reimplementation discipline as the EWMA/BFS/PCA checks in
test_operators_unit.py: the DuckDB oracle proves engine parity, these
prove both engines compute the INTENDED mathematics."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from mapreduce_itwiki_spark.plans import catalog
from mapreduce_itwiki_spark.sources.parquet import load_table

from conftest import SF_SMALL


def _md5_int(s: str, lo: int, hi: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[lo:hi], 16)


def test_feature_hash_matches_python_md5(spark):
    """feature_hash_vectorize against the hashing trick computed row by
    row in Python (dim and sign from the same md5 digits)."""
    got = {
        (r.doc_id, r.dim): r.feat
        for r in catalog.queries()["feature_hash_vectorize"](
            spark, SF_SMALL
        ).collect()
    }
    expect: dict[tuple[int, int], int] = defaultdict(int)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    for r in docs.collect():
        for tok in r.text.split(" "):
            dim = _md5_int(tok, 0, 15) % 16
            sign = 1 if _md5_int(tok, 15, 16) % 2 == 0 else -1
            expect[(r.doc_id, dim)] += sign
    assert got == dict(expect)


def test_target_encode_matches_python(spark):
    """target_encode_loo against the direct leave-one-out means."""
    events = load_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value"
    )
    rows = events.collect()
    s: dict[str, float] = defaultdict(float)
    n: dict[str, int] = defaultdict(int)
    for r in rows:
        s[r.event_type] += r.value
        n[r.event_type] += 1
    got = {
        r.event_id: r.loo_mean
        for r in catalog.queries()["target_encode_loo"](spark, SF_SMALL).collect()
    }
    for r in rows:
        expect = (round(s[r.event_type], 6) - r.value) / (n[r.event_type] - 1)
        assert abs(got[r.event_id] - expect) < 1e-6, r.event_id


def test_ols_trend_matches_closed_form(spark):
    """ols_trend_per_user against the least-squares closed form computed
    in plain Python from the same (ts, event_id)-ordered positions."""
    events = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    by_user: dict[int, list] = defaultdict(list)
    for r in events.collect():
        by_user[r.user_id].append((r.ts, r.event_id, r.value))
    got = {
        r.user_id: (r.n, r.slope, r.intercept)
        for r in catalog.queries()["ols_trend_per_user"](spark, SF_SMALL).collect()
    }
    for uid, rows in by_user.items():
        rows.sort()
        ys = [v for _, _, v in rows]
        n = len(ys)
        if n < 2:
            assert uid not in got
            continue
        xs = range(1, n + 1)
        sx, sxx = sum(xs), sum(x * x for x in xs)
        sy, sxy = sum(ys), sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        gn, gs, gi = got[uid]
        assert gn == n
        assert abs(gs - slope) < 1e-5, uid
        assert abs(gi - intercept) < 1e-5, uid


def test_logreg_gd_matches_numpy(spark):
    """logreg_gd_steps against the same two full-batch GD steps in
    numpy (rational sigmoid, 9-dp gradient rounding)."""
    import numpy as np

    emb = load_table(spark, SF_SMALL, "embeddings").select("embedding", "label")
    rows = emb.collect()
    x = np.array([r.embedding[:4] for r in rows], dtype=np.float64)
    y = np.array([r.label % 2 for r in rows], dtype=np.float64)
    g1 = np.round(((0.5 - y)[:, None] * x).mean(axis=0), 9)
    w1 = -0.5 * g1
    z = x @ w1
    err = 0.5 + 0.5 * (z / (1 + np.abs(z))) - y
    g2 = np.round((err[:, None] * x).mean(axis=0), 9)
    w2 = np.round(w1 - 0.5 * g2, 9)
    got = {
        r.j: (r.w1, r.w2)
        for r in catalog.queries()["logreg_gd_steps"](spark, SF_SMALL).collect()
    }
    assert sorted(got) == [1, 2, 3, 4]
    for j in range(4):
        gw1, gw2 = got[j + 1]
        assert abs(gw1 - w1[j]) < 1e-8, j
        assert abs(gw2 - w2[j]) < 1e-8, j
    # the step moved the weights: a zero gradient would make the
    # operator vacuous
    assert any(abs(v) > 0 for v in w2)


def test_skyline_matches_quadratic_dominance(spark):
    """skyline_pareto_parts (sort-based sharded plan) against the O(n²)
    dominance definition in plain Python."""
    part = load_table(spark, SF_SMALL, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    pts = [(r.p_partkey, r.p_retailprice, r.p_size) for r in part.collect()]
    expect = set()
    for k, price, size in pts:
        dominated = any(
            q_price <= price
            and q_size >= size
            and (q_price < price or q_size > size)
            for _, q_price, q_size in pts
        )
        if not dominated:
            expect.add(k)
    got = {
        r.p_partkey
        for r in catalog.queries()["skyline_pareto_parts"](spark, SF_SMALL).collect()
    }
    assert got == expect and got


def test_market_basket_metrics_hand_counted(spark):
    """market_basket_rules: recompute every rule's support, confidence
    and lift from hand-counted baskets."""
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey")
    baskets: dict[int, set[int]] = defaultdict(set)
    for r in li.collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    n_orders = len(baskets)
    item: dict[int, int] = defaultdict(int)
    pair: dict[tuple[int, int], int] = defaultdict(int)
    for items in baskets.values():
        for p in items:
            item[p] += 1
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                pair[(a, b)] += 1
    rules = catalog.queries()["market_basket_rules"](spark, SF_SMALL).collect()
    expect_pairs = {k for k, v in pair.items() if v >= 2}
    assert {(r.pa, r.pb) for r in rules} == expect_pairs and rules
    for r in rules:
        n_ab = pair[(r.pa, r.pb)]
        assert r.n_ab == n_ab
        assert abs(r.support - n_ab / n_orders) < 1e-6
        assert abs(r.confidence - n_ab / item[r.pa]) < 1e-6
        assert abs(r.lift - n_ab * n_orders / (item[r.pa] * item[r.pb])) < 1e-6


def test_auc_matches_python_midranks(spark):
    """classifier_auc_eval against the Mann-Whitney midrank formula on a
    plain-Python sorted list (and the probabilistic definition on a
    tie-free subsample of comparisons)."""
    docs = load_table(spark, SF_SMALL, "documents").select("text", "lang")
    trigrams = ["the", "ing", "ion", "and", "ent", "for", "ati", "ter"]
    scored = []
    for r in docs.collect():
        score = sum(
            (len(r.text) - len(r.text.replace(t, ""))) // 3 for t in trigrams
        )
        scored.append((score, r.lang == "en"))
    scored.sort()
    # midranks with ties
    mid: dict[int, float] = {}
    i = 0
    while i < len(scored):
        j = i
        while j < len(scored) and scored[j][0] == scored[i][0]:
            j += 1
        mid[scored[i][0]] = (i + 1 + j) / 2  # average of ranks i+1..j
        i = j
    n_pos = sum(1 for _, p in scored if p)
    n_neg = len(scored) - n_pos
    s = sum(mid[sc] for sc, p in scored if p)
    auc = (s - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    row = catalog.queries()["classifier_auc_eval"](spark, SF_SMALL).collect()[0]
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert abs(row.auc - auc) < 1e-6
    assert 0.0 <= row.auc <= 1.0


def test_pr_curve_matches_python(spark):
    """classifier_pr_curve against direct threshold sweeps."""
    docs = load_table(spark, SF_SMALL, "documents").select("text", "lang")
    trigrams = ["the", "ing", "ion", "and", "ent", "for", "ati", "ter"]
    scored = []
    for r in docs.collect():
        score = sum(
            (len(r.text) - len(r.text.replace(t, ""))) // 3 for t in trigrams
        )
        scored.append((score, r.lang == "en"))
    n_pos = sum(1 for _, p in scored if p)
    rows = catalog.queries()["classifier_pr_curve"](spark, SF_SMALL).collect()
    assert {r.score for r in rows} == {s for s, _ in scored}
    for r in rows:
        tp = sum(1 for s, p in scored if p and s >= r.score)
        fp = sum(1 for s, p in scored if not p and s >= r.score)
        assert (r.tp, r.fp) == (tp, fp), r.score
        assert abs(r.precision - tp / (tp + fp)) < 1e-6
        assert abs(r.recall - tp / n_pos) < 1e-6


def test_allpairs_equals_bruteforce_python(spark):
    """allpairs_prefix_jaccard against brute-force shingle-set Jaccard
    in plain Python — the completeness property of prefix filtering
    (the DuckDB oracle proves it too; this removes both engines from
    the loop)."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    sets: dict[int, set[str]] = {}
    for r in docs.collect():
        toks = r.text.split(" ")
        k = 3
        n = max(len(toks) - k + 1, 1)
        sets[r.doc_id] = {" ".join(toks[i : i + k]) for i in range(n)}
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if 5 * inter >= 4 * union:
                expect[(a, b)] = inter / union
    got = {
        (r.da, r.db): r.jacc
        for r in catalog.queries()["allpairs_prefix_jaccard"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(expect) and got
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-6, k


def test_bellman_ford_matches_python(spark):
    """weighted_shortest_path against plain-Python synchronous
    Bellman-Ford over the identical md5-weighted bigram graph."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    edges: dict[tuple[str, str], int] = {}
    sources: set[str] = set()
    for r in docs.collect():
        toks = r.text.split(" ")
        sources.add(toks[0])
        for w1, w2 in zip(toks, toks[1:]):
            if w1 != w2:
                edges[(w1, w2)] = 1 + _md5_int(f"{w1} {w2}", 0, 15) % 8
    dist: dict[str, int] = {s: 0 for s in sources}
    for _ in range(3):
        nxt = dict(dist)
        for (w1, w2), wt in edges.items():
            if w1 in dist:
                cand = dist[w1] + wt
                if w2 not in nxt or cand < nxt[w2]:
                    nxt[w2] = cand
        dist = nxt
    got = {
        r.node: r.dist
        for r in catalog.queries()["weighted_shortest_path"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == dist and got


def test_naive_bayes_prediction_consistency(spark):
    """naive_bayes_langid ↔ naive_bayes_confusion consistency: the
    confusion matrix is exactly the grouped predictions, cells sum to
    the corpus size, and the correct flags match the diagonal mass.
    (Accuracy itself is a property of the synthetic corpus, not of the
    operator — the 31-token shared vocabulary makes language ID hard by
    construction, so no accuracy floor is asserted.)"""
    preds = catalog.queries()["naive_bayes_langid"](spark, SF_SMALL).collect()
    conf = catalog.queries()["naive_bayes_confusion"](spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert len(preds) == n_docs
    assert sum(r.n for r in conf) == n_docs
    diag = sum(r.n for r in conf if r.true_lang == r.pred_lang)
    assert diag == sum(1 for r in preds if r.correct)
    by_pred: dict[str, int] = defaultdict(int)
    for r in preds:
        by_pred[r.pred_lang] += 1
    by_conf: dict[str, int] = defaultdict(int)
    for r in conf:
        by_conf[r.pred_lang] += r.n
    assert by_pred == by_conf
    for r in preds:
        assert math.isfinite(r.score) and r.score < 0


def test_seasonal_anomaly_matches_python(spark):
    """seasonal_hour_anomaly against per-hour baselines computed in
    plain Python (population stddev)."""
    events = load_table(spark, SF_SMALL, "events").select("event_id", "ts", "value")
    by_hour: dict[int, list[float]] = defaultdict(list)
    rows = events.collect()
    for r in rows:
        by_hour[r.ts.hour].append(r.value)
    stats = {}
    for h, vs in by_hour.items():
        mu = sum(vs) / len(vs)
        sd = math.sqrt(sum((v - mu) ** 2 for v in vs) / len(vs))
        stats[h] = (round(mu, 6), round(sd, 6))
    got = {
        r.event_id: (r.hod, r.z, r.is_anomaly)
        for r in catalog.queries()["seasonal_hour_anomaly"](spark, SF_SMALL).collect()
    }
    n_anom = 0
    for r in rows:
        mu, sd = stats[r.ts.hour]
        z = round((r.value - mu) / sd, 6)
        hod, gz, ga = got[r.event_id]
        assert hod == r.ts.hour
        assert abs(gz - z) < 1e-5, r.event_id
        assert ga == (abs(z) > 3.0)
        n_anom += ga
    # events.value is heavy-tailed by construction — flags must fire
    assert n_anom > 0


def test_chi2_matches_python_contingency(spark):
    """chi2_feature_selection against 2×2 contingency tables counted in
    plain Python over document-level token presence."""
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "text"
    )
    rows = docs.collect()
    n_docs = len(rows)
    by_lang: dict[str, int] = defaultdict(int)
    tok_docs: dict[str, int] = defaultdict(int)
    cell: dict[tuple[str, str], int] = defaultdict(int)
    for r in rows:
        by_lang[r.lang] += 1
        for tok in set(r.text.split(" ")):
            tok_docs[tok] += 1
            cell[(r.lang, tok)] += 1
    best: dict[str, list[tuple[float, str]]] = defaultdict(list)
    for lang, n_l in by_lang.items():
        for tok, n_t in tok_docs.items():
            a = cell.get((lang, tok), 0)
            b, c = n_t - a, n_l - a
            d = n_docs - n_t - n_l + a
            den = (a + b) * (c + d) * (a + c) * (b + d)
            if den == 0 or a == 0 and b == 0:
                continue
            chi2 = round(n_docs * (a * d - b * c) ** 2 / den, 6)
            best[lang].append((-chi2, tok))
    expect = {}
    for lang, scored in best.items():
        for neg, tok in sorted(scored)[:5]:
            expect[(lang, tok)] = -neg
    got = {
        (r.lang, r.tok): r.chi2
        for r in catalog.queries()["chi2_feature_selection"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-6, k


def test_ols_residual_metrics_match_python(spark):
    """ols_residual_metrics against plain-Python residual computation
    off the same closed-form fit."""
    events = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    by_user: dict[int, list] = defaultdict(list)
    for r in events.collect():
        by_user[r.user_id].append((r.ts, r.event_id, r.value))
    got = {
        r.user_id: (r.rmse, r.mae, r.r2)
        for r in catalog.queries()["ols_residual_metrics"](
            spark, SF_SMALL
        ).collect()
    }
    for uid, rows in by_user.items():
        rows.sort()
        ys = [v for _, _, v in rows]
        n = len(ys)
        if n < 2:
            assert uid not in got
            continue
        xs = range(1, n + 1)
        sx, sxx = sum(xs), sum(x * x for x in xs)
        sy, sxy = sum(ys), sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        b0 = (sy - slope * sx) / n
        res = [y - (slope * x + b0) for x, y in zip(xs, ys)]
        ssr = sum(r * r for r in res)
        mae = sum(abs(r) for r in res) / n
        sst = sum(y * y for y in ys) - sy * sy / n
        rmse = math.sqrt(ssr / n)
        r2 = 1 - ssr / sst
        g_rmse, g_mae, g_r2 = got[uid]
        assert abs(g_rmse - rmse) < 1e-4, uid
        assert abs(g_mae - mae) < 1e-4, uid
        assert abs(g_r2 - r2) < 1e-4, uid
    # R² must be a real fit quality: in (-inf, 1], finite everywhere
    assert all(r2 <= 1.0 for _, _, r2 in got.values())


def test_fuzzy_match_equals_bruteforce_python(spark):
    """fuzzy_name_match_dist1 against brute-force pairwise comparison
    (names are fixed-width, so distance-1 = exactly one differing
    character)."""
    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    names = {r.c_custkey: r.c_name for r in cust.collect()}
    ids = sorted(names)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            na, nb = names[a], names[b]
            if len(na) == len(nb) and sum(x != y for x, y in zip(na, nb)) == 1:
                expect.add((a, b))
    got = {
        (r.ka, r.kb)
        for r in catalog.queries()["fuzzy_name_match_dist1"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expect and got


def _brute_jacc_pairs(texts: dict[int, str]) -> dict[tuple[int, int], float]:
    sets = {}
    for d, t in texts.items():
        toks = t.split(" ")
        n = max(len(toks) - 2, 1)
        sets[d] = {" ".join(toks[i : i + 3]) for i in range(n)}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if 5 * inter >= 4 * union:
                out[(a, b)] = inter / union
    return out


def test_allpairs_adversarial_boundary_corpora(spark):
    """allpairs_pipeline on constructed corpora that stress the prefix
    filter where real data happens not to: Jaccard EXACTLY τ = 4/5
    (suffix-extension pair: shingle sets 4 ⊂ 5 → 4/5, must be kept by
    the >= threshold), just-below τ (4/6, must be dropped), identical
    docs, one-token docs (the greatest(n-2,1) single-shingle edge), and
    in-document token repeats (array_distinct collapse)."""
    from mapreduce_itwiki_spark.plans.ml_features import allpairs_pipeline

    corpora = [
        # exact-τ boundary: doc 2 extends doc 1 by one token
        {1: "t1 t2 t3 t4 t5 t6", 2: "t1 t2 t3 t4 t5 t6 t7"},
        # just below τ: two extra tokens → 4/6
        {1: "t1 t2 t3 t4 t5 t6", 2: "t1 t2 t3 t4 t5 t6 t7 t8"},
        # identical pair + an unrelated doc
        {1: "a b c d e", 2: "a b c d e", 3: "x y z w v"},
        # one- and two-token docs (single short shingle each)
        {1: "solo", 2: "solo", 3: "solo extra", 4: "other"},
        # in-document repetition: distinct shingle sets still equal
        {1: "p q p q p q", 2: "p q p q p q p q"},
        # mixed: a near-dup cluster of three plus noise
        {
            1: "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10",
            2: "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 tail",
            3: "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 tail tip",
            4: "n1 n2 n3 n4 n5",
        },
    ]
    for texts in corpora:
        docs = spark.createDataFrame(
            [(d, t) for d, t in texts.items()], "doc_id long, text string"
        )
        got = {
            (r.da, r.db): r.jacc for r in allpairs_pipeline(docs).collect()
        }
        expect = _brute_jacc_pairs(texts)
        assert set(got) == set(expect), (texts, got, expect)
        for k, v in expect.items():
            assert abs(got[k] - v) < 1e-6, (texts, k)


def test_quantile_rank_matches_python_ecdf(spark):
    """value_quantile_rank against a plain-Python ECDF."""
    events = load_table(spark, SF_SMALL, "events").select("event_id", "value")
    rows = events.collect()
    vals = sorted(r.value for r in rows)
    n = len(vals)
    import bisect

    got = {
        r.event_id: r.q
        for r in catalog.queries()["value_quantile_rank"](spark, SF_SMALL).collect()
    }
    for r in rows:
        q = bisect.bisect_right(vals, r.value) / n
        assert abs(got[r.event_id] - q) < 1e-6, r.event_id
    assert max(got.values()) == 1.0


def test_ab_test_welch_matches_python(spark):
    """ab_test_welch against plain-Python Welch statistics with the
    same md5 arm assignment."""
    events = load_table(spark, SF_SMALL, "events").select(
        "event_type", "user_id", "value"
    )
    groups: dict[tuple[str, int], list[float]] = defaultdict(list)
    for r in events.collect():
        arm = _md5_int(str(r.user_id), 0, 15) % 2
        groups[(r.event_type, arm)].append(r.value)
    got = {
        r.event_type: (r.na, r.nb, r.mean_diff, r.t)
        for r in catalog.queries()["ab_test_welch"](spark, SF_SMALL).collect()
    }
    for etype in {k[0] for k in groups}:
        a, b = groups[(etype, 0)], groups[(etype, 1)]
        na, nb = len(a), len(b)
        ma, mb = sum(a) / na, sum(b) / nb
        va = (sum(x * x for x in a) - sum(a) ** 2 / na) / (na - 1)
        vb = (sum(x * x for x in b) - sum(b) ** 2 / nb) / (nb - 1)
        t = (ma - mb) / math.sqrt(va / na + vb / nb)
        g_na, g_nb, g_diff, g_t = got[etype]
        assert (g_na, g_nb) == (na, nb)
        assert abs(g_diff - (ma - mb)) < 1e-5, etype
        assert abs(g_t - t) < 1e-4, etype


def test_kaplan_meier_matches_python(spark):
    """kaplan_meier_churn against the textbook product-limit estimator
    in plain Python (compared in log space)."""
    import datetime

    events = load_table(spark, SF_SMALL, "events").select("user_id", "ts")
    last: dict[int, int] = {}
    for r in events.collect():
        day = (r.ts.date() - datetime.date(2024, 1, 1)).days
        last[r.user_id] = max(last.get(r.user_id, -1), day)
    n_users = len(last)
    churn: dict[int, int] = defaultdict(int)
    for d in last.values():
        churn[d] += 1
    got = {
        r.day: (r.at_risk, r.churned, r.log_surv)
        for r in catalog.queries()["kaplan_meier_churn"](spark, SF_SMALL).collect()
    }
    at_risk = n_users
    log_s = 0.0
    seen = 0
    for d in sorted(churn):
        if churn[d] < at_risk:
            log_s += math.log(1 - churn[d] / at_risk)
            g_risk, g_churn, g_log = got[d]
            assert (g_risk, g_churn) == (at_risk, churn[d]), d
            assert abs(g_log - log_s) < 1e-5, d
            seen += 1
        at_risk -= churn[d]
    assert seen == len(got) and seen > 0


def test_bootstrap_matches_python_poisson(spark):
    """bootstrap_mean_ci against the same Poisson bootstrap in plain
    Python (md5 weights, identical thresholds), plus sanity: the CI
    straddles the plain mean."""
    from mapreduce_itwiki_spark.plans.ml_features import BOOT_B, BOOT_M, BOOT_T

    events = load_table(spark, SF_SMALL, "events").select("event_id", "value")
    rows = events.collect()
    means = []
    for b in range(BOOT_B):
        sw = swx = 0
        for r in rows:
            h = _md5_int(f"{r.event_id}|{b}", 0, 15) % BOOT_M
            w = 5
            for k, t in enumerate(BOOT_T):
                if h < t:
                    w = k
                    break
            sw += w
            swx += w * r.value
        means.append(round(round(swx, 6) / sw, 6))
    bm = sum(means) / len(means)
    var = sum((m - bm) ** 2 for m in means) / (len(means) - 1)
    se = math.sqrt(var)
    row = catalog.queries()["bootstrap_mean_ci"](spark, SF_SMALL).collect()[0]
    assert row.n_replicates == BOOT_B
    assert abs(row.boot_mean - bm) < 1e-5
    assert abs(row.se - se) < 1e-5
    plain_mean = sum(r.value for r in rows) / len(rows)
    assert row.ci_lo < plain_mean < row.ci_hi
    # weights must actually vary (a degenerate all-1 hash would make
    # the bootstrap vacuous)
    assert row.se > 0


def test_bm25_matches_python(spark):
    """bm25_topk against textbook BM25 computed in plain Python over the
    full corpus (then top-20 by (score desc, doc_id))."""
    from mapreduce_itwiki_spark.plans.ml_features import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOPK,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    rows = [(r.doc_id, r.text.split(" ")) for r in docs.collect()]
    n = len(rows)
    avgdl = round(sum(len(t) for _, t in rows) / n, 6)
    df: dict[str, int] = defaultdict(int)
    for _, toks in rows:
        for term in BM25_TERMS:
            if term in toks:
                df[term] += 1
    idf = {
        t: round(math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)), 7)
        for t in BM25_TERMS
        if df[t]
    }
    scores = {}
    for doc_id, toks in rows:
        dl = len(toks)
        s = 0.0
        for term, w in idf.items():
            tf = toks.count(term)
            if tf:
                s += round(
                    w
                    * (tf * (BM25_K1 + 1))
                    / (tf + BM25_K1 * ((1 - BM25_B) + BM25_B * (dl / avgdl))),
                    7,
                )
        if s:
            scores[doc_id] = round(s, 7)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOPK]
    got = [
        (r.doc_id, r.score)
        for r in catalog.queries()["bm25_topk"](spark, SF_SMALL).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        assert abs(a - b) < 1e-6


def test_tree_split_matches_python_gini(spark):
    """tree_split_histogram against an exhaustive plain-Python scan of
    every candidate threshold's Gini decrease."""
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_returnflag"
    )
    pts: dict[str, list] = defaultdict(list)
    for r in li.collect():
        y = 1 if r.l_returnflag == "R" else 0
        pts["quantity"].append((int(round(r.l_quantity)), y))
        pts["discount"].append((int(round(r.l_discount * 100)), y))
        pts["tax"].append((int(round(r.l_tax * 100)), y))

    def gini(pos: int, n: int) -> float:
        p, q = pos / n, (n - pos) / n
        return 1 - p * p - q * q

    expect = {}
    for feat, vals in pts.items():
        nt, post = len(vals), sum(y for _, y in vals)
        best = None
        for b in sorted({v for v, _ in vals})[:-1]:  # last bin: empty right
            nl = sum(1 for v, _ in vals if v <= b)
            posl = sum(y for v, y in vals if v <= b)
            g = round(
                gini(post, nt)
                - (nl / nt) * gini(posl, nl)
                - ((nt - nl) / nt) * gini(post - posl, nt - nl),
                9,
            )
            if best is None or g > best[1]:
                best = (b, g)
        expect[feat] = best
    got = {
        r.feature: (r.split_bin, r.gain)
        for r in catalog.queries()["tree_split_histogram"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(expect)
    for feat in expect:
        assert got[feat][0] == expect[feat][0], feat
        assert abs(got[feat][1] - expect[feat][1]) < 1e-8, feat


def test_als_half_step_matches_numpy(spark):
    """als_half_step against numpy: build each user's YᵀY + λI and Yᵀr
    from the same md5-grid item factors and solve with linalg."""
    import numpy as np

    events = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_type", "value"
    )
    ratings: dict[tuple[int, str], float] = defaultdict(float)
    for r in events.collect():
        ratings[(r.user_id, r.event_type)] += r.value
    yf = {}
    for _, et in set(ratings):
        yf[et] = (
            (_md5_int(f"{et}|1", 0, 15) % 1000) / 1000.0,
            (_md5_int(f"{et}|2", 0, 15) % 1000) / 1000.0,
        )
    by_user: dict[int, list] = defaultdict(list)
    for (u, et), v in ratings.items():
        by_user[u].append((yf[et], round(v, 6)))
    got = {
        r.user_id: (r.x1, r.x2)
        for r in catalog.queries()["als_half_step"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_user)
    lam = 0.25
    for u, items in by_user.items():
        Y = np.array([y for y, _ in items])
        r_u = np.array([v for _, v in items])
        x = np.linalg.solve(Y.T @ Y + lam * np.eye(2), Y.T @ r_u)
        assert abs(got[u][0] - x[0]) < 1e-5, u
        assert abs(got[u][1] - x[1]) < 1e-5, u


def test_contrastive_negatives_deterministic_draws(spark):
    """contrastive_negatives against the md5 mod-N draw replayed in
    Python — including self-pair drops and the lang labels."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    lang = {r.doc_id: r.lang for r in docs.collect()}
    n = len(lang)
    expect = {}
    for d in lang:
        for j in range(4):
            neg = _md5_int(f"{d}|{j}", 0, 15) % n
            if neg != d:
                expect[(d, j)] = (neg, lang[d], lang[neg], lang[d] != lang[neg])
    got = {
        (r.doc_id, r.j): (r.neg_id, r.anchor_lang, r.neg_lang, r.cross_lingual)
        for r in catalog.queries()["contrastive_negatives"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expect


def test_allpairs_df_cap_drops_boilerplate_candidates(spark):
    """The ALLPAIRS_MAX_DF stop-shingle guard (VERDICT r4 #1): prefix
    entries above the DF cap generate no candidates, so an identical
    boilerplate cluster (every shingle near-universal) produces ZERO
    pairs under a binding cap while a rare-shingle near-dup pair at
    exactly τ still surfaces; uncapped (max_df=None) restores the
    textbook algorithm and finds the boilerplate pairs too."""
    from mapreduce_itwiki_spark.plans.ml_features import allpairs_pipeline

    texts = {
        # five identical boilerplate docs: every 3-gram has DF=5
        **{d: "b1 b2 b3 b4 b5 b6" for d in range(1, 6)},
        # a rare near-dup pair at exactly τ=4/5 (suffix extension)
        6: "r1 r2 r3 r4 r5 r6",
        7: "r1 r2 r3 r4 r5 r6 r7",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    capped = {
        (r.da, r.db): r.jacc
        for r in allpairs_pipeline(docs, max_df=2).collect()
    }
    assert capped == {(6, 7): 0.8}, capped
    uncapped = {
        (r.da, r.db) for r in allpairs_pipeline(docs, max_df=None).collect()
    }
    assert {(a, b) for a in range(1, 6) for b in range(a + 1, 6)} <= uncapped
    assert (6, 7) in uncapped
