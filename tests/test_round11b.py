"""Round-11 operator properties the sf-fixture oracle gate cannot pin
on its own (the r8-BPE / r9-LZW lesson: bugs SHARED by the Spark query
and its DuckDB oracle are invisible to the gate — catch them with a
third implementation under hypothesis):

* skyline closed form — the m1 (strict-suffix max) / m2 (tie-group
  max) rule that BOTH engines use, property-tested against brute-force
  domination on random integer point sets, including duplicate points
  and full ties;
* k-core peel — the simultaneous-rounds semantics both engines unroll,
  against (a) an order-independent sequential peel (the k-core is
  unique, so any removal order must land on the same set) and (b) the
  min-degree/maximality definition;
* Heaps decile curve — the ceil-decile mapping + first-occurrence
  logic as a pure-python twin against the DuckDB window form on random
  corpora (DuckDB here is the cheap second engine; the Spark side is
  pinned to DuckDB by the gate, so agreement is transitive).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------------------
# skyline / pareto frontier
# --------------------------------------------------------------------------

def _brute_frontier(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (qx >= x and qy >= y and (qx > x or qy > y))
            for j, (qx, qy) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _closed_form_frontier(pts):
    """The m1/m2 rule exactly as q_pareto_frontier evaluates it."""
    out = []
    for x, y in pts:
        m1 = max((qy for qx, qy in pts if qx > x), default=-1)
        m2 = max(qy for qx, qy in pts if qx == x)
        if m1 < y and m2 <= y:
            out.append((x, y))
    return sorted(out)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_skyline_closed_form_equals_bruteforce(pts):
    assert _closed_form_frontier(pts) == _brute_frontier(pts)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=60, deadline=None)
def test_skyline_duckdb_window_form_equals_bruteforce(pts):
    """The RANGE-window SQL the oracle uses (strict-suffix max via
    RANGE 1 FOLLOWING, tie max via PARTITION BY qty) against brute
    force — duplicates co-survive by the skyline convention."""
    con = duckdb.connect()
    df = pd.DataFrame({"qty": [p[0] for p in pts],
                       "rev": [p[1] for p in pts]})
    con.register("per", df)
    got = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT qty, rev FROM (
              SELECT qty, rev,
                     MAX(rev) OVER (ORDER BY qty
                                    RANGE BETWEEN 1 FOLLOWING
                                    AND UNBOUNDED FOLLOWING) AS m1,
                     MAX(rev) OVER (PARTITION BY qty) AS m2
              FROM per)
            WHERE (m1 IS NULL OR m1 < rev) AND m2 <= rev
            """
        ).fetchall()
    )
    # brute force over the MULTISET: a duplicated frontier point
    # appears once per instance in both forms
    want = sorted(
        (x, y) for (x, y) in pts if (x, y) in set(_brute_frontier(pts))
    )
    assert got == want


# --------------------------------------------------------------------------
# k-core peel
# --------------------------------------------------------------------------

def _simultaneous_peel_rounds(edges, k, rounds):
    """graph_kcore_peel's semantics: per round drop ALL nodes of
    degree < k at once; returns the survivor set per round."""
    nodes = {v for e in edges for v in e}
    surv = set(nodes)
    out = [set(surv)]
    for _ in range(rounds):
        deg = {}
        for a, b in edges:
            if a in surv and b in surv:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        surv = {v for v in surv if deg.get(v, 0) >= k}
        out.append(set(surv))
    return out


def _sequential_peel(edges, k, order):
    """Remove degree-deficient nodes ONE AT A TIME in the given
    preference order until none remain — the k-core is unique, so this
    must land on the simultaneous peel's fixpoint."""
    surv = {v for e in edges for v in e}
    while True:
        deg = {v: 0 for v in surv}
        for a, b in edges:
            if a in surv and b in surv:
                deg[a] += 1
                deg[b] += 1
        weak = sorted((v for v in surv if deg[v] < k), key=order)
        if not weak:
            return surv
        surv.discard(weak[0])


@st.composite
def _graphs(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    edges = draw(
        st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] != t[1]),
            min_size=1,
            max_size=24,
        )
    )
    return sorted(edges)


@settings(max_examples=200, deadline=None)
@given(_graphs(), st.integers(min_value=1, max_value=4))
def test_kcore_simultaneous_peel_is_order_independent(edges, k):
    rounds = _simultaneous_peel_rounds(edges, k, rounds=len(edges) + 2)
    fix = rounds[-1]
    # reached a fixpoint inside the budget
    assert rounds[-1] == rounds[-2]
    # uniqueness: ascending- and descending-order sequential peels both
    # land on the same set
    assert _sequential_peel(edges, k, order=lambda v: v) == fix
    assert _sequential_peel(edges, k, order=lambda v: -v) == fix
    # definition: min degree >= k inside the core
    deg = {}
    for a, b in edges:
        if a in fix and b in fix:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
    assert all(deg.get(v, 0) >= k for v in fix)
    # trajectory is monotone non-increasing
    sizes = [len(s) for s in rounds]
    assert sizes == sorted(sizes, reverse=True)


@settings(max_examples=40, deadline=None)
@given(_graphs())
def test_kcore_duckdb_round_form_matches_python_twin(edges):
    """The unrolled per-round SQL (join both endpoints against the
    previous survivor set, keep degree >= k) on DuckDB reproduces the
    python twin's per-round survivor sets — the shape both the Spark
    query and its oracle share."""
    k = 2
    rounds = 3
    twin = _simultaneous_peel_rounds(edges, k, rounds)
    con = duckdb.connect()
    con.register(
        "und", pd.DataFrame({"a": [e[0] for e in edges],
                             "b": [e[1] for e in edges]})
    )
    ctes = ["e AS (SELECT a AS v, b AS nbr FROM und"
            " UNION ALL SELECT b, a FROM und)",
            "s0 AS (SELECT DISTINCT v FROM e)"]
    for i in range(1, rounds + 1):
        ctes.append(
            f"d{i} AS (SELECT e.v, COUNT(*) AS d FROM e"
            f" JOIN s{i - 1} pa ON pa.v = e.v"
            f" JOIN s{i - 1} pb ON pb.v = e.nbr GROUP BY e.v)"
        )
        ctes.append(f"s{i} AS (SELECT v FROM d{i} WHERE d >= {k})")
    for i in range(rounds + 1):
        got = {
            r[0]
            for r in con.execute(
                "WITH " + ",".join(ctes) + f" SELECT v FROM s{i}"
            ).fetchall()
        }
        assert got == twin[i], f"round {i}"


# --------------------------------------------------------------------------
# Heaps decile curve
# --------------------------------------------------------------------------

def _py_heaps(texts):
    """First-occurrence decile table over word BIGRAMS, python twin."""
    stream = []
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            stream.append(toks[i] + " " + toks[i + 1])
    n = len(stream)
    if n == 0:
        return []
    first = {}
    for pos, w in enumerate(stream, start=1):
        first.setdefault(w, pos)
    per = {}
    for fp in first.values():
        d = (10 * fp + n - 1) // n
        per[d] = per.get(d, 0) + 1
    out, cum = [], 0
    for d in sorted(per):
        cum += per[d]
        seen = d * n // 10
        out.append((d, seen, per[d], cum, cum * 1_000_000 // seen))
    return out


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "aa", "bb"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_heaps_duckdb_form_matches_python_twin(texts):
    want = _py_heaps(texts)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = [
        tuple(r)
        for r in con.execute(
            """
            WITH tok AS MATERIALIZED (
              SELECT doc_id, u['p'] AS p,
                     t[u['p']] || ' ' || t[u['p'] + 1] AS w
              FROM (
                SELECT doc_id, t,
                       unnest(list_transform(range(1, len(t)),
                                             i -> {'p': i})) AS u
                FROM (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents)
              )
            ),
            g AS (SELECT w, row_number() OVER (ORDER BY doc_id, p)
                         AS gpos FROM tok),
            n AS (SELECT COUNT(*) AS n FROM g),
            firsts AS (SELECT w, MIN(gpos) AS fp FROM g GROUP BY w),
            d AS (SELECT (10 * fp + n.n - 1) // n.n AS decile, n.n AS n
                  FROM firsts CROSS JOIN n),
            per AS (SELECT decile, MAX(n) AS n, COUNT(*) AS new_types
                    FROM d GROUP BY decile)
            SELECT CAST(decile AS BIGINT),
                   CAST((decile * n) // 10 AS BIGINT),
                   CAST(new_types AS BIGINT),
                   CAST(SUM(new_types) OVER w AS BIGINT),
                   CAST(CAST(SUM(new_types) OVER w AS BIGINT) * 1000000
                        // ((decile * n) // 10) AS BIGINT)
            FROM per
            WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW)
            ORDER BY decile
            """
        ).fetchall()
    ]
    assert got == want
    # structural invariants: vocab_cum strictly increasing, tokens_seen
    # non-decreasing, final cum = distinct bigram count
    if want:
        cums = [r[3] for r in want]
        assert cums == sorted(cums) and len(set(cums)) == len(cums)


# --------------------------------------------------------------------------
# Boruvka minimum spanning forest
# --------------------------------------------------------------------------

def _kruskal_msf(wedges):
    """Unique MSF under the (w, a, b) total order — the reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for w, a, b in sorted(wedges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.append((w, a, b))
    return sorted(forest)


def _boruvka_rounds(wedges, rounds):
    """graph_boruvka_msf's semantics: per round every component picks
    its min (w, a, b) outgoing edge; all join the forest at once;
    labels = connected components of the forest."""
    nodes = {v for _, a, b in wedges for v in (a, b)}
    label = {v: v for v in nodes}

    def relabel(forest):
        adj = {}
        for _, a, b in forest:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        lab = {}
        for v in nodes:
            if v in lab:
                continue
            stack, comp = [v], []
            seen = {v}
            while stack:
                x = stack.pop()
                comp.append(x)
                for y in adj.get(x, []):
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            root = min(comp)
            for x in comp:
                lab[x] = root
        return lab

    forest = set()
    traj = [(len(set(label.values())), 0, 0)]
    for _ in range(rounds):
        best = {}
        for w, a, b in wedges:
            ca, cb = label[a], label[b]
            if ca == cb:
                continue
            for c in (ca, cb):
                if c not in best or (w, a, b) < best[c]:
                    best[c] = (w, a, b)
        forest |= set(best.values())
        label = relabel(forest)
        traj.append(
            (len(set(label.values())), len(forest),
             sum(w for w, _, _ in forest))
        )
    return sorted(forest), traj


@st.composite
def _weighted_graphs(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    edges = draw(
        st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] != t[1]),
            min_size=1,
            max_size=20,
        )
    )
    # weights INTENTIONALLY collide a lot (0..3): the (w, a, b)
    # total-order tie-break is what's under test
    return sorted(
        (draw(st.integers(min_value=0, max_value=3)), a, b)
        for a, b in edges
    )


@settings(max_examples=200, deadline=None)
@given(_weighted_graphs())
def test_boruvka_converges_to_kruskal_msf(wedges):
    want = _kruskal_msf(wedges)
    # enough rounds to span any component (components at least halve)
    forest, traj = _boruvka_rounds(wedges, rounds=6)
    assert forest == want
    # trajectory invariants: component count non-increasing, forest
    # monotone growing, never a cycle (edges <= nodes - components)
    comps = [t[0] for t in traj]
    assert comps == sorted(comps, reverse=True)
    n_nodes = len({v for _, a, b in wedges for v in (a, b)})
    for n_comp, n_edges, _ in traj:
        assert n_edges == n_nodes - n_comp  # forest exactly spans


# --------------------------------------------------------------------------
# sweep-cut interval-delta identity
# --------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(_graphs())
def test_sweep_cut_interval_deltas_equal_direct_counts(edges):
    """cut(S_k) computed the operator's way — prefix(lo-deltas) −
    prefix(hi-deltas) — equals the direct definition (#edges with
    exactly one endpoint ranked ≤ k) for EVERY k, under an arbitrary
    rank permutation of the nodes."""
    nodes = sorted({v for e in edges for v in e})
    # deterministic "score" permutation: rank by (v * 7919 mod 104729)
    order = sorted(nodes, key=lambda v: (v * 7919 % 104729, v))
    rk = {v: i + 1 for i, v in enumerate(order)}
    n = len(nodes)
    a = [0] * (n + 2)
    b = [0] * (n + 2)
    for u, v in edges:
        lo, hi = min(rk[u], rk[v]), max(rk[u], rk[v])
        a[lo] += 1
        b[hi] += 1
    pa = pb = 0
    for k in range(1, n + 1):
        pa += a[k]
        pb += b[k]
        direct = sum(
            1
            for u, v in edges
            if (rk[u] <= k) != (rk[v] <= k)
        )
        assert pa - pb == direct, f"k={k}"
