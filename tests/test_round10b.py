"""Late-round-10 operator tests — invariants the sf-fixture oracle gate
cannot pin on its own:

* algebraic fixpoints (chi² ≡ 0 under exact independence, Spearman
  ρ ≡ ±1 on monotone data, silhouette ≡ +1 on collapsed clusters);
* unit semantics of the syllable heuristic and the PMI lift on
  hand-computable corpora;
* structural invariants of the iterative ops (HITS normalization hits
  SCALE exactly; WL refinement never merges colors).
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest


def _write_documents(dirpath: str, texts: list[str]) -> None:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(os.path.join(dirpath, "documents.parquet"), index=False)


def _write_documents_grid(dirpath: str) -> None:
    """source ⟂ lang exactly: every (source, lang) cell has count 3."""
    rows = []
    for s in ("sA", "sB"):
        for lg in ("en", "fr", "de"):
            for i in range(3):
                rows.append((len(rows), "w", lg, s, 1))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(os.path.join(dirpath, "documents.parquet"), index=False)


def _write_events(dirpath: str, rows: list[tuple[int, float]]) -> None:
    """(event_id, value) with ts strictly increasing in event_id."""
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime(
                [1704067200_000_000 + 60_000_000 * r[0] for r in rows],
                unit="us",
            ),
            "user_id": [1] * len(rows),
            "event_type": ["synthetic"] * len(rows),
            "value": [r[1] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(os.path.join(dirpath, "events.parquet"), index=False)


def _write_embeddings(
    dirpath: str, vecs: list[tuple[int, list[float], int]]
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(dirpath, "embeddings.parquet"))


def test_cramers_v_zero_under_exact_independence(spark, tmp_path):
    """With a perfectly balanced source×lang grid, o·n = r·c in every
    cell, so every fixed-point χ² term — and V itself — must be
    EXACTLY zero (any engine round-off would show up here)."""
    from fluent_bit_filter_math_spark.operators.quality import dq_cramers_v

    d = str(tmp_path)
    _write_documents_grid(d)
    row = dq_cramers_v(spark, d).collect()[0]
    assert row.chi2_fp == 0
    assert row.cramers_v == 0.0
    assert (row.r_cats, row.c_cats, row.n) == (2, 3, 18)


def test_spearman_rho_exactly_one_on_monotone_data(spark, tmp_path):
    """Strictly increasing values over strictly increasing time ⇒ the
    doubled centered ranks coincide (u = v row-for-row) and
    ρ = Σuv/(√Σu²·√Σv²) must be EXACTLY 1.0 — the identity only holds
    if both rank assignments are exact."""
    from fluent_bit_filter_math_spark.operators.quality import (
        dq_spearman_trend,
    )

    d = str(tmp_path)
    _write_events(d, [(i, 10.0 + 3.5 * i) for i in range(40)])
    row = dq_spearman_trend(spark, d).collect()[0]
    assert row.suv == row.su2 == row.sv2 > 0
    assert row.spearman_rho == 1.0


def test_spearman_rho_minus_one_and_tie_centering(spark, tmp_path):
    """Decreasing values ⇒ ρ = −1 exactly; and with ties the doubled
    centered ranks must still sum to zero (Σu = 0 is the centering
    invariant the two-level assignment has to preserve)."""
    from fluent_bit_filter_math_spark.operators.quality import (
        dq_spearman_trend,
    )

    d = str(tmp_path)
    _write_events(d, [(i, 1000.0 - 2.0 * i) for i in range(25)])
    row = dq_spearman_trend(spark, d).collect()[0]
    assert row.spearman_rho == -1.0
    assert row.suv == -row.su2 == -row.sv2


def test_hits_normalization_and_rank_shape(spark, sf_dir):
    from fluent_bit_filter_math_spark.operators.graph import (
        HITS_SCALE,
        HITS_TOPK,
        graph_hits,
    )

    rows = graph_hits(spark, sf_dir).collect()
    by_role = {}
    for r in rows:
        by_role.setdefault(r.role, []).append(r)
    assert set(by_role) == {"auth", "hub"}
    for role, rs in by_role.items():
        ranks = [r.rank for r in rs]
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= HITS_TOPK
        scores = [r.score_fp for r in rs]
        # L∞ normalization: the top node is exactly SCALE, the rest
        # are ≤ and sorted non-increasing.
        assert scores[0] == HITS_SCALE
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        assert all(0 <= s <= HITS_SCALE for s in scores)


def test_wl_refinement_never_merges_colors(spark, sf_dir):
    """1-WL refinement is a partition REFINEMENT: the distinct-color
    count is non-decreasing round over round (hash collisions aside),
    and the node count never changes."""
    from fluent_bit_filter_math_spark.operators.graph import (
        graph_wl_refinement,
    )

    rows = graph_wl_refinement(spark, sf_dir).collect()
    assert [r.wl_round for r in rows] == [0, 1, 2]
    assert len({r.n_nodes for r in rows}) == 1
    assert rows[0].n_colors <= rows[1].n_colors <= rows[2].n_colors
    # Degree-init gives few colors; one round must already separate.
    assert rows[1].n_colors > rows[0].n_colors or rows[0].n_colors == rows[0].n_nodes


def test_pr_at_k_internal_consistency(spark, sf_dir):
    """hits is the running sum of rel; P@k and the AP numerator are
    exact integer identities of it; rr_fp is 1e12 div first-rel rank."""
    from fluent_bit_filter_math_spark.operators.retrieval import (
        _PR_S,
        retrieval_pr_at_k,
    )

    rows = retrieval_pr_at_k(spark, sf_dir).collect()
    assert [r.k for r in rows] == list(range(1, len(rows) + 1))
    run, ap = 0, 0
    first_rel = None
    for r in rows:
        run += r.rel
        assert r.hits == run
        assert r.p_at_k_fp == r.hits * _PR_S // r.k
        ap += r.rel * r.p_at_k_fp
        assert r.ap_num_fp == ap
        if first_rel is None and r.rel == 1:
            first_rel = r.k
    expect_rr = 0 if first_rel is None else _PR_S // first_rel
    assert all(r.rr_fp == expect_rr for r in rows)


def test_flesch_syllable_heuristic_units(spark, tmp_path):
    """Hand-checked syllable counts: vowel groups, the silent trailing
    'e', the '-le' exception, 'y' as a vowel, and the floor at 1."""
    from fluent_bit_filter_math_spark.operators.text import (
        text_flesch_readability,
    )

    d = str(tmp_path)
    cases = {
        "table": 2,   # ta-ble: '-le' keeps its e
        "make": 1,    # silent trailing e drops
        "a": 1,       # floor at 1 (len ≤ 2 keeps its vowel)
        "rhythm": 1,  # y counts as a vowel group
        "queue": 1,   # 'ueue' is ONE vowel run
        "banana": 3,
        "grr": 1,     # no vowels still floors at 1
    }
    _write_documents(d, [w for w in cases])
    rows = {r.doc_id: r for r in text_flesch_readability(spark, d).collect()}
    for i, (w, syl) in enumerate(cases.items()):
        assert rows[i].n_words == 1
        assert rows[i].n_syllables == syl, w
        # One-word doc: flesch = 206.835 − 1.015 − 84.6·syl, pinned.
        expect = math.floor(
            (206.835 - 1.015 * 1.0 - 84.6 * (syl / 1)) * 1e6 + 0.5
        )
        assert rows[i].flesch_fp == expect, w


def test_pmi_lift_hand_computed(spark, tmp_path):
    """Corpus of 6 docs 'xx yy zz' ⇒ N=18, c(xx)=c(yy)=c(zz)=6,
    c(xx,yy)=c(yy,zz)=6: lift = 6·18·1e6 div 36 = 3e6 for both
    bigrams; nothing below min-count leaks in."""
    from fluent_bit_filter_math_spark.operators.text import (
        text_pmi_collocations,
    )

    d = str(tmp_path)
    _write_documents(d, ["xx yy zz"] * 6)
    rows = text_pmi_collocations(spark, d).collect()
    got = {(r.w1, r.w2): r for r in rows}
    assert set(got) == {("xx", "yy"), ("yy", "zz")}
    for r in rows:
        assert r.c_xy == 6 and r.c_x == 6 and r.c_y == 6
        assert r.lift_fp == 6 * 18 * 1_000_000 // 36


def test_silhouette_collapsed_clusters_score_one(spark, tmp_path):
    """Vectors identical within each label and labels far apart:
    a = 0 and b > 0 for every vector, so every per-vector s_fp is
    EXACTLY 1e9 and so is each label mean."""
    from fluent_bit_filter_math_spark.operators.similarity import (
        _SIL_S,
        emb_silhouette,
    )

    d = str(tmp_path)
    dim = 8
    vecs = []
    for vid in range(6):
        label = vid % 2
        base = [0.0] * dim
        base[0] = 0.4 if label == 0 else -0.4
        vecs.append((vid, base, label))
    _write_embeddings(d, vecs)
    rows = emb_silhouette(spark, d).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_vecs == 3
        assert r.mean_s_fp == _SIL_S
        assert r.sum_s_fp == 3 * _SIL_S


def _write_orders(dirpath: str, rows: list[tuple[int, int, float]]) -> None:
    """(o_orderkey, o_custkey, o_totalprice) with full orders schema."""
    pdf = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [r[2] for r in rows],
            "o_orderdate": pd.to_datetime(
                [1704067200_000_000] * len(rows), unit="us"
            ),
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    )
    pdf.to_parquet(
        os.path.join(dirpath, "orders.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def test_hhi_monopoly_and_uniform_fixpoints(spark, tmp_path):
    """One source ⇒ HHI exactly 1; k equal sources ⇒ hhi_num·k =
    hhi_den exactly (HHI = 1/k) and eff_sources = k."""
    from fluent_bit_filter_math_spark.operators.relational import (
        agg_hhi_source_mix,
    )

    d = str(tmp_path)
    rows = []
    # lang 'mono': all chars from one source; lang 'quad': 4 equal.
    for i in range(6):
        rows.append((len(rows), "w" * 10, "mono", "only", 10))
    for s in ("s1", "s2", "s3", "s4"):
        rows.append((len(rows), "w" * 25, "quad", s, 25))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    got = {r.lang: r for r in agg_hhi_source_mix(spark, d).collect()}
    assert got["mono"].hhi == 1.0 and got["mono"].eff_sources == 1.0
    q = got["quad"]
    assert q.n_sources == 4
    assert q.hhi_num * 4 == q.hhi_den
    assert q.hhi == 0.25 and q.eff_sources == 4.0


def test_lorenz_uniform_spend_is_diagonal(spark, tmp_path):
    """Equal spend per customer ⇒ the Lorenz curve IS the diagonal:
    at each decile share_fp = n_cum·1e12 div n, and the last decile
    closes at exactly 1e12 with cum_cents = total_cents."""
    from fluent_bit_filter_math_spark.operators.relational import (
        agg_lorenz_deciles,
    )

    d = str(tmp_path)
    n = 40
    _write_orders(d, [(i, i, 250.0) for i in range(n)])
    rows = agg_lorenz_deciles(spark, d).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    for r in rows:
        assert r.share_fp == r.n_cum * 10**12 // n
    last = rows[-1]
    assert last.n_cum == n
    assert last.cum_cents == last.total_cents
    assert last.share_fp == 10**12


def test_lorenz_concentrated_spend_is_convex(spark, tmp_path):
    """One whale holds ~all revenue: bottom deciles' shares stay near
    zero, the curve is non-decreasing and convex in the bucket sums,
    and ranks are ascending by spend (the whale lands in decile 10)."""
    from fluent_bit_filter_math_spark.operators.relational import (
        agg_lorenz_deciles,
    )

    d = str(tmp_path)
    orders = [(i, i, 1.0) for i in range(19)] + [(19, 19, 981.0)]
    _write_orders(d, orders)
    rows = agg_lorenz_deciles(spark, d).collect()
    shares = [r.share_fp for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    # bottom 90% of customers hold 19/1000 of revenue
    assert rows[-2].cum_cents == 18 * 100
    assert rows[-1].share_fp == 10**12


def test_spearman_two_level_ranks_match_naive_model(spark, tmp_path):
    """12 seeded-random groups (ties in value AND time, negatives,
    skewed magnitudes) through ONE Spark job vs a pure-Python
    average-rank Spearman: the two-level bucket rank must reproduce
    the naive doubled-centered ranks EXACTLY — suv/su2/sv2 integer-
    equal and rho bitwise — including across shiftright bucket
    boundaries of negative cents."""
    import random as rnd

    from fluent_bit_filter_math_spark.operators.quality import (
        dq_spearman_trend,
    )

    r = rnd.Random(0xC0FFEE)
    rows = []
    expected = {}
    eid = 0
    for g in range(12):
        n = r.randint(3, 60)
        # cents drawn from a small pool → many ties; mixed signs.
        pool = [r.randint(-5000, 5000) for _ in range(max(2, n // 3))]
        cents = [r.choice(pool) for _ in range(n)]
        # timestamps: minute grid with duplicates (ties in y).
        mins = sorted(r.choice(range(n)) for _ in range(n))
        us = [1704067200_000_000 + 60_000_000 * m for m in mins]

        def dranks(vals):
            svals = sorted(vals)
            first = {}
            cnt = {}
            for i, v in enumerate(svals):
                first.setdefault(v, i)
                cnt[v] = cnt.get(v, 0) + 1
            return [2 * first[v] + cnt[v] for v in vals]

        dx, dy = dranks(cents), dranks(us)
        suv = sum((a - n) * (b - n) for a, b in zip(dx, dy))
        su2 = sum((a - n) ** 2 for a in dx)
        sv2 = sum((b - n) ** 2 for b in dy)
        rho = (
            0.0
            if su2 == 0 or sv2 == 0
            else suv / math.sqrt(su2) / math.sqrt(sv2)
        )
        expected[f"g{g:02d}"] = (n, suv, su2, sv2, rho)
        for c, u in zip(cents, us):
            rows.append((eid, f"g{g:02d}", c / 100.0, u))
            eid += 1

    pdf = pd.DataFrame(
        {
            "event_id": [x[0] for x in rows],
            "ts": pd.to_datetime([x[3] for x in rows], unit="us"),
            "user_id": [1] * len(rows),
            "event_type": [x[1] for x in rows],
            "value": [x[2] for x in rows],
            "props": ["{}"] * len(rows),
        }
    )
    d = str(tmp_path)
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    got = {r2.event_type: r2 for r2 in dq_spearman_trend(spark, d).collect()}
    assert set(got) == set(expected)
    for g, (n, suv, su2, sv2, rho) in expected.items():
        row = got[g]
        assert (row.n_events, row.suv, row.su2, row.sv2) == (n, suv, su2, sv2), g
        assert row.spearman_rho == rho, g


def test_l_diversity_homogeneous_class_flagged(spark, tmp_path):
    """A QI class whose members all share one balance band is the
    homogeneity attack l-diversity exists to catch: l_distinct = 1,
    flagged, counted in rows_at_risk; a diverse class stays silent."""
    from fluent_bit_filter_math_spark.operators.quality import (
        _LDIV_MIN,
        dq_l_diversity,
    )

    d = str(tmp_path)
    rows = []
    # class (7, 'HOMOG'): 6 customers, all in band 0 (acctbal ≈ $500).
    for i in range(6):
        rows.append((len(rows), f"c{i}", 7, 500.0 + i, "HOMOG"))
    # class (8, 'DIVERSE'): _LDIV_MIN distinct $2000 bands.
    for i in range(_LDIV_MIN):
        rows.append((len(rows), f"d{i}", 8, 2000.0 * i + 100.0, "DIVERSE"))
    pdf = pd.DataFrame(
        rows,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    )
    pdf.to_parquet(os.path.join(d, "customer.parquet"), index=False)
    out = dq_l_diversity(spark, d).collect()
    assert [(r.c_nationkey, r.c_mktsegment) for r in out] == [(7, "HOMOG")]
    r = out[0]
    assert r.class_size == 6 and r.l_distinct == 1
    assert r.l_diversity == 1 and r.risky_classes == 1
    assert r.rows_at_risk == 6


def test_personalized_pagerank_matches_python_fold(spark, tmp_path):
    """Path graph p100—s1—p150—s2—p250 with the single seed p100: run
    the exact integer recursion in pure Python and require the Spark
    table to match VALUE-FOR-VALUE (seeds-only teleport, propagation
    decay, zero mass beyond the unrolled horizon)."""
    from fluent_bit_filter_math_spark.operators.graph import (
        PR_ITERS,
        PR_SCALE,
        graph_personalized_pagerank,
    )

    d = str(tmp_path)
    pairs = [(100, 1), (150, 1), (150, 2), (250, 2)]
    pd.DataFrame(
        {
            "l_partkey": [p for p, _ in pairs],
            "l_suppkey": [s for _, s in pairs],
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"), index=False)

    edges = {}
    for p, s in pairs:
        a, b = 2 * p, 2 * s + 1
        edges.setdefault(a, set()).add(b)
        edges.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in edges.items()}
    rank = {v: PR_SCALE if v % 200 == 0 else 0 for v in deg}
    for _ in range(PR_ITERS):
        contrib = {v: 0 for v in deg}
        for u, ns in edges.items():
            for v in ns:
                contrib[v] += rank[u] // deg[u]
        rank = {
            v: ((15 * PR_SCALE) // 100 if v % 200 == 0 else 0)
            + 85 * contrib[v] // 100
            for v in deg
        }
    got = {r.node: r.rank_fp for r in
           graph_personalized_pagerank(spark, d).collect()}
    assert got == rank
    # mass reaches exactly the PR_ITERS-hop horizon: p250 sits 4 hops
    # from the seed, so it must hold ZERO mass after 3 rounds (the
    # locality property global PageRank does not have)
    assert rank[2 * 250] == 0
    assert rank[2 * 100] > 0 and rank[2 * 150] > 0


def test_repeat_purchase_median_gap_buckets(spark, tmp_path):
    """Hand-built order histories: gaps [7,7,21] → lower median 7 →
    week 1; [30] → 30 → week 4; single-order customers excluded."""
    from fluent_bit_filter_math_spark.operators.relational import (
        q_repeat_purchase_intervals,
    )

    d = str(tmp_path)
    day = 86_400_000_000
    t0 = 1704067200_000_000
    rows = []
    # customer 1: orders at day 0, 7, 14, 35 → gaps 7,7,21
    for k, off in enumerate((0, 7, 14, 35)):
        rows.append((len(rows), 1, t0 + off * day))
    # customer 2: orders at day 0, 30 → gap 30
    for off in (0, 30):
        rows.append((len(rows), 2, t0 + off * day))
    # customer 3: single order — no gaps, excluded
    rows.append((len(rows), 3, t0))
    pdf = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [100.0] * len(rows),
            "o_orderdate": pd.to_datetime([r[2] for r in rows], unit="us"),
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    )
    pdf.to_parquet(
        os.path.join(d, "orders.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    out = {r.gap_week: r for r in
           q_repeat_purchase_intervals(spark, d).collect()}
    assert set(out) == {1, 4}
    assert out[1].n_customers == 1
    assert (out[1].min_gap_days, out[1].max_gap_days) == (7, 7)
    assert out[4].n_customers == 1
    assert (out[4].min_gap_days, out[4].max_gap_days) == (30, 30)


def test_hits_matches_python_fold(spark, tmp_path):
    """Tiny bipartite catalog (3 parts × 2 suppliers, uneven fan-out):
    run the exact integer half-steps in pure Python and require the
    Spark output to match value-for-value, ranks included."""
    from fluent_bit_filter_math_spark.operators.graph import (
        HITS_ITERS,
        HITS_SCALE,
        graph_hits,
    )

    d = str(tmp_path)
    pairs = [(1, 1), (2, 1), (3, 1), (3, 2)]
    pd.DataFrame(
        {
            "l_partkey": [p for p, _ in pairs],
            "l_suppkey": [s for _, s in pairs],
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"), index=False)

    parts = sorted({p for p, _ in pairs})
    supps = sorted({s for _, s in pairs})
    h = {p: HITS_SCALE for p in parts}
    a = {}
    for _ in range(HITS_ITERS):
        raw_a = {s: sum(h[p] for p, s2 in pairs if s2 == s) for s in supps}
        m = max(raw_a.values())
        a = {s: raw_a[s] * HITS_SCALE // m for s in supps}
        raw_h = {p: sum(a[s] for p2, s in pairs if p2 == p) for p in parts}
        m = max(raw_h.values())
        h = {p: raw_h[p] * HITS_SCALE // m for p in parts}

    rows = graph_hits(spark, d).collect()
    got_a = {r.node: r.score_fp for r in rows if r.role == "auth"}
    got_h = {r.node: r.score_fp for r in rows if r.role == "hub"}
    assert got_a == a
    assert got_h == h
    # supplier 1 serves every part: must be the top authority at SCALE
    assert got_a[1] == HITS_SCALE


def test_wl_refinement_matches_python_model(spark, tmp_path):
    """Path-plus-triangle co-supply graph through the full WL recursion
    in pure Python (portable md5 colors, numeric-sorted multisets):
    per-round color sets and fingerprints must match bitwise. Catches
    sort-order, serialization, and hash-spelling drift the structural
    invariants can't."""
    import hashlib

    from fluent_bit_filter_math_spark.operators.graph import (
        _TRI_KEEP_MOD,
        _TRI_PART_MOD,
        WL_ROUNDS,
        graph_wl_refinement,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    d = str(tmp_path)
    # suppliers 1..5; co-supply pairs via shared parts (partkey % 50
    # == 0 to survive the sample filter); keep only pairs the hash
    # sparsifier keeps, mirroring the operator exactly.
    # Chosen so the md5 sparsifier KEEPS a connected 6-node path plus
    # a star — pre-searched pairs with h60("a:b") % 13 == 0.
    cand = [
        (1, 4), (4, 11), (7, 11), (7, 10), (2, 10),
        (3, 8), (3, 9), (3, 22),
        (1, 2), (5, 6),  # these two get dropped by the sparsifier
    ]
    pairs, rows, pk = [], [], 0
    for aa, bb in cand:
        if h60(f"{aa}:{bb}") % _TRI_KEEP_MOD == 0:
            pass  # kept by the operator — no extra work here
        pk += _TRI_PART_MOD
        rows += [(pk, aa), (pk, bb)]
        pairs.append((aa, bb))
    pd.DataFrame(
        {
            "l_partkey": [p for p, _ in rows],
            "l_suppkey": [s for _, s in rows],
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"), index=False)

    kept = [
        (aa, bb) for aa, bb in pairs
        if h60(f"{aa}:{bb}") % _TRI_KEEP_MOD == 0
    ]
    if not kept:
        pytest.skip("sparsifier kept no edges for this candidate set")
    nbrs = {}
    for aa, bb in kept:
        nbrs.setdefault(aa, []).append(bb)
        nbrs.setdefault(bb, []).append(aa)
    colors = {v: len(ns) for v, ns in nbrs.items()}
    expect = []

    def summary(c, rnd):
        ordered = sorted(c.values())
        fp = h60(",".join(str(x) for x in ordered))
        return (rnd, len(c), len(set(c.values())), fp)

    expect.append(summary(colors, 0))
    for rnd in range(1, WL_ROUNDS + 1):
        colors = {
            v: h60(
                f"{colors[v]}|"
                + ",".join(str(x) for x in sorted(colors[u] for u in ns))
            )
            for v, ns in nbrs.items()
        }
        expect.append(summary(colors, rnd))

    got = [
        (r.wl_round, r.n_nodes, r.n_colors, r.fingerprint)
        for r in graph_wl_refinement(spark, d).collect()
    ]
    assert got == expect


def test_mase_constant_and_seasonal_series(spark, tmp_path):
    """A perfectly 7-periodic daily series has ZERO seasonal error but
    nonzero naive error ⇒ mase_fp = 0; a linear-trend series has equal
    |c−c7| = 7·|c−c1| per row ⇒ mase_fp exactly 7e6."""
    from fluent_bit_filter_math_spark.operators.temporal import (
        ts_mase_seasonal_naive,
    )

    d = str(tmp_path)
    day = 86_400_000_000
    t0 = 1704067200_000_000
    rows = []
    # 'periodic': value cycles with period 7 for 28 days
    for k in range(28):
        rows.append((len(rows), "periodic", float(10 + (k % 7)), t0 + k * day))
    # 'trend': value = k (strictly linear) for 28 days
    for k in range(28):
        rows.append((len(rows), "trend", float(k), t0 + k * day))
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[3] for r in rows], unit="us"),
            "user_id": [1] * len(rows),
            "event_type": [r[1] for r in rows],
            "value": [r[2] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    got = {r.event_type: r for r in
           ts_mase_seasonal_naive(spark, d).collect()}
    assert got["periodic"].seasonal_abs_err == 0
    assert got["periodic"].naive_abs_err > 0
    assert got["periodic"].mase_fp == 0
    assert got["trend"].n_days == 21
    assert got["trend"].mase_fp == 7_000_000


def test_missing_dates_finds_planted_gap(spark, tmp_path):
    """Days 0..9 with {3,4,5,8} removed: expected 10, observed 6,
    missing 4, longest gap 3 — and a gapless group reports zeros."""
    from fluent_bit_filter_math_spark.operators.quality import (
        dq_missing_dates,
    )

    d = str(tmp_path)
    day = 86_400_000_000
    t0 = 1704067200_000_000
    rows = []
    for k in (0, 1, 2, 6, 7, 9):
        rows.append((len(rows), "GAPPY", t0 + k * day))
    for k in range(5):
        rows.append((len(rows), "SOLID", t0 + k * day))
    pdf = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [1] * len(rows),
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [100.0] * len(rows),
            "o_orderdate": pd.to_datetime([r[2] for r in rows], unit="us"),
            "o_orderpriority": [r[1] for r in rows],
        }
    )
    pdf.to_parquet(
        os.path.join(d, "orders.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    got = {r.o_orderpriority: r for r in dq_missing_dates(spark, d).collect()}
    g = got["GAPPY"]
    assert (g.expected_days, g.observed_days, g.missing_days) == (10, 6, 4)
    assert g.longest_gap_days == 3
    s = got["SOLID"]
    assert (s.expected_days, s.missing_days, s.longest_gap_days) == (5, 0, 0)


def test_lorenz_two_level_ranks_match_naive_model(spark, tmp_path):
    """Seeded-random customer spends with heavy ties and values that
    straddle the >>16 bucket boundary: every decile row must match a
    naive sorted-python model exactly (membership, cumulative cents,
    and the HUGEINT/DECIMAL-widened share fixed point)."""
    import random as rnd

    from fluent_bit_filter_math_spark.operators.relational import (
        agg_lorenz_deciles,
    )

    r = rnd.Random(0xD10E)
    n = 137
    # spends: tie-heavy pool spanning 2^16-cent bucket boundaries
    pool = [655.35, 655.36, 1310.71, 1310.72, 12.5, 9999.99, 655.35]
    spends = [r.choice(pool) + r.choice((0.0, 0.01)) for _ in range(n)]
    d = str(tmp_path)
    _write_orders(d, [(i, i, spends[i]) for i in range(n)])

    cents = sorted(
        (int(math.floor(v * 100.0 + 0.5)), k) for k, v in enumerate(spends)
    )
    total = sum(c for c, _ in cents)
    model = {}
    cum_n = cum_c = 0
    rows_by_decile = {}
    for rk, (c, _) in enumerate(cents, start=1):
        dec = (10 * rk + n - 1) // n
        rows_by_decile.setdefault(dec, []).append(c)
    for dec in sorted(rows_by_decile):
        cum_n += len(rows_by_decile[dec])
        cum_c += sum(rows_by_decile[dec])
        model[dec] = (cum_n, cum_c, cum_c * 10**12 // total)

    got = {r2.decile: r2 for r2 in agg_lorenz_deciles(spark, d).collect()}
    assert set(got) == set(model)
    for dec, (n_cum, cum_cents, share) in model.items():
        row = got[dec]
        assert (row.n_cum, row.cum_cents) == (n_cum, cum_cents), dec
        assert row.total_cents == total
        assert row.share_fp == share, dec


def test_cdc_chunks_match_python_model_and_shift_resilience(
    spark, tmp_path
):
    """Full python-twin parity for the stateless CDC chunker, plus THE
    content-defined property: doc2 = junk-prefix + doc1 re-aligns to
    the same cut points after the first post-insertion cut, so shared
    suffix chunks dedup across the two docs (fixed-size blocking would
    share nothing)."""
    import hashlib
    import random as rnd

    from fluent_bit_filter_math_spark.operators.dedup import (
        CDC_D,
        CDC_TOPK,
        CDC_W,
        dedup_cdc_chunks,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def chunks_of(text: str) -> list[str]:
        n = len(text)
        cuts = [
            p for p in range(CDC_W, n)
            if h60(text[p - CDC_W:p]) % CDC_D == 0
        ]
        bounds = [0] + cuts + [n]
        return [
            text[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
        ]

    r = rnd.Random(0xCDC)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
    doc1 = " ".join(r.choice(words) for _ in range(120))
    doc2 = "zq9 " + doc1
    doc3 = " ".join(r.choice(words) for _ in range(40))
    _write_documents(str(tmp_path), [doc1, doc2, doc3])

    counts: dict[int, list] = {}
    for i, t in enumerate((doc1, doc2, doc3)):
        for ch in chunks_of(t):
            e = counts.setdefault(h60(ch), [len(ch), 0, set()])
            e[1] += 1
            e[2].add(i)
    dups = sorted(
        (
            (fp, ln, occ, len(docs))
            for fp, (ln, occ, docs) in counts.items()
            if occ >= 2
        ),
        key=lambda x: (-x[2], x[0]),
    )[:CDC_TOPK]
    assert dups, "fixture must produce shared chunks"
    # the shift-resilience claim itself: some dup spans BOTH docs
    assert any(nd >= 2 for _, _, _, nd in dups)

    got = [
        (r2.chunk_fp, r2.chunk_len, r2.n_occurrences, r2.n_docs)
        for r2 in dedup_cdc_chunks(spark, str(tmp_path)).collect()
    ]
    assert got == dups


def test_hyperanf_matches_python_model(spark, tmp_path):
    """Full python-twin HyperANF on the pre-searched sparsifier-
    surviving graph: identical registers (md5 bucket + trailing-zero
    rho), identical max-merge rounds, identical exact-integer raw-HLL
    estimates — and the neighborhood function must be non-decreasing
    in the radius (balls only grow)."""
    import hashlib

    from fluent_bit_filter_math_spark.operators.graph import (
        ANF_ROUNDS,
        _ANF_M,
        _ANF_P56,
        _TRI_KEEP_MOD,
        _TRI_PART_MOD,
        graph_hyperanf_nf,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    d = str(tmp_path)
    cand = [
        (1, 4), (4, 11), (7, 11), (7, 10), (2, 10),
        (3, 8), (3, 9), (3, 22),
    ]
    rows, pk = [], 0
    for aa, bb in cand:
        pk += _TRI_PART_MOD
        rows += [(pk, aa), (pk, bb)]
    pd.DataFrame(
        {
            "l_partkey": [p for p, _ in rows],
            "l_suppkey": [s for _, s in rows],
        }
    ).to_parquet(os.path.join(d, "lineitem.parquet"), index=False)

    kept = [
        (aa, bb) for aa, bb in cand
        if h60(f"{aa}:{bb}") % _TRI_KEEP_MOD == 0
    ]
    assert kept
    nbrs = {}
    for aa, bb in kept:
        nbrs.setdefault(aa, set()).add(bb)
        nbrs.setdefault(bb, set()).add(aa)

    def rho(w: int) -> int:
        for k in range(1, 41):
            if w % (1 << k) == (1 << (k - 1)):
                return k
        return 41

    regs = {}
    for v in nbrs:
        h = h60(str(v))
        regs[v] = {h % _ANF_M: rho(h // _ANF_M)}

    def est_milli(m: dict) -> int:
        s = (_ANF_M - len(m)) * _ANF_P56 + sum(
            _ANF_P56 >> val for val in m.values()
        )
        return 673 * 256 * _ANF_P56 // s

    expect = []
    for radius in range(ANF_ROUNDS + 1):
        if radius:
            regs = {
                v: {
                    reg: max(
                        src.get(reg, 0)
                        for src in [regs[v]] + [regs[u] for u in ns]
                    )
                    for reg in set(regs[v])
                    | {rg for u in ns for rg in regs[u]}
                }
                for v, ns in nbrs.items()
            }
        expect.append(
            (radius, len(regs), sum(est_milli(m) for m in regs.values()))
        )

    got = [
        (r.radius, r.n_nodes, r.nf_sum_milli)
        for r in graph_hyperanf_nf(spark, d).collect()
    ]
    assert got == expect
    nf = [x[2] for x in got]
    assert all(a <= b for a, b in zip(nf, nf[1:]))


def test_mmr_matches_python_greedy(spark, tmp_path):
    """Hand-built embedding set through the exact greedy MMR in pure
    Python: a near-duplicate of the best match must be SKIPPED in
    favor of a farther-but-diverse vector (the whole point of MMR),
    and every selected (rank, vec_id, score) must match exactly."""
    from fluent_bit_filter_math_spark.operators.similarity import (
        MMR_K,
        sim_mmr_diversify,
    )

    d = str(tmp_path)
    dim = 4

    def v(*xs):
        return list(xs) + [0.0] * (dim - len(xs))

    # label 0 = the query cluster (centroid ≈ origin); candidates:
    # 1 at distance .1; 2 = near-dup of 1; 3 orthogonal at .12;
    # plus spread fillers so the pool has MMR_K+ members.
    vecs = [(0, v(0.001), 0), (1, v(-0.001), 0)]
    vecs.append((10, v(0.1), 1))
    vecs.append((11, v(0.1001), 1))       # near-dup of 10
    vecs.append((12, v(0.0, 0.12), 1))    # diverse
    for k in range(13, 13 + MMR_K + 3):
        vecs.append((k, v(0.0, 0.0, 0.05 * (k - 12), 0.3), 1))
    _write_embeddings(d, vecs)

    def q6(x):
        return int(math.floor(x * 1e6 + 0.5))

    import itertools
    xq = {vid: [q6(x) for x in e] for vid, e, _ in vecs}
    csum = [0] * dim
    lab0 = [e for _, e, l in vecs if l == 0]
    cent = [
        sum(q6(e[j]) for e in lab0) // len(lab0) for j in range(dim)
    ]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    pool = sorted(
        ((d2(xq[vid], cent), vid) for vid, _, _ in vecs),
        )[:50]
    pool = [(vid, dq) for dq, vid in pool]
    sel = [pool[0]]
    expect = [(1, pool[0][0], pool[0][1], None)]
    for r in range(2, MMR_K + 1):
        best = None
        for vid, dq in pool:
            if any(vid == s for s, _ in sel):
                continue
            score = min(d2(xq[vid], xq[s]) for s, _ in sel) - dq
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, dq, score)
        sel.append((best[1], best[2]))
        expect.append((r, best[1], best[2], best[3]))

    got = [
        (r2.rank, r2.vec_id, r2.dist_q, r2.mmr_score)
        for r2 in sim_mmr_diversify(spark, d).collect()
    ]
    assert got == expect
    picked = [vid for _, vid, _, _ in expect]
    # 10 and its near-dup 11 must not BOTH be picked before the
    # diverse 12 (redundancy is penalized)
    if 10 in picked and 11 in picked:
        assert picked.index(12) < max(picked.index(10), picked.index(11))


def test_cdc_short_docs_are_single_chunks(spark, tmp_path):
    """Documents shorter than the rolling window can never cut: three
    identical 5-byte docs produce ONE fingerprint with 3 occurrences
    (and the sub-window sequence guard never flips to descending)."""
    from fluent_bit_filter_math_spark.operators.dedup import (
        dedup_cdc_chunks,
    )

    d = str(tmp_path)
    _write_documents(d, ["tiny!", "tiny!", "tiny!", "x"])
    rows = dedup_cdc_chunks(spark, d).collect()
    assert len(rows) == 1
    assert rows[0].n_occurrences == 3
    assert rows[0].chunk_len == 5
    assert rows[0].n_docs == 3


def test_missing_dates_single_day_group(spark, tmp_path):
    """A group whose whole history is one day: expected = observed =
    1, zero missing, zero gap (the lag window yields no rows to MAX —
    the COALESCE path)."""
    from fluent_bit_filter_math_spark.operators.quality import (
        dq_missing_dates,
    )

    d = str(tmp_path)
    t0 = 1704067200_000_000
    pdf = pd.DataFrame(
        {
            "o_orderkey": [0, 1],
            "o_custkey": [1, 2],
            "o_orderstatus": ["O", "O"],
            "o_totalprice": [1.0, 2.0],
            "o_orderdate": pd.to_datetime([t0, t0 + 3600_000_000],
                                          unit="us"),
            "o_orderpriority": ["ONE-DAY", "ONE-DAY"],
        }
    )
    pdf.to_parquet(
        os.path.join(d, "orders.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    r = dq_missing_dates(spark, d).collect()[0]
    assert (r.expected_days, r.observed_days) == (1, 1)
    assert (r.missing_days, r.longest_gap_days) == (0, 0)


def test_flesch_empty_text_floors(spark, tmp_path):
    """Empty text tokenizes to one empty token: the word floor (1) and
    syllable floor (1) keep the score finite and deterministic."""
    from fluent_bit_filter_math_spark.operators.text import (
        text_flesch_readability,
    )

    d = str(tmp_path)
    _write_documents(d, ["", "word"])
    rows = {r.doc_id: r for r in
            text_flesch_readability(spark, d).collect()}
    assert rows[0].n_words == 1 and rows[0].n_syllables == 1
    assert rows[0].flesch_fp == rows[1].flesch_fp  # both 1 word/1 syl
