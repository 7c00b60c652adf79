"""Cross-engine fuzz for the round-9 integer-decision tricks that the
one-corpus oracle parity can't generalize:

- dq6's p-chart flag cross-multiplies |p_d - p̄| > 3·sqrt(p̄(1-p̄)/n_d)
  to (o_d·N - O·n_d)² > 9·O·(N-O)·n_d — fuzz the integer decision
  against the float definition over arbitrary day ledgers (away from
  the knife edge, where the float form itself is ill-defined).
- dq4's chi-square numerator Σ(24·o_h - T)² (+ T² per absent hour)
  must equal the float chi² times 24T on arbitrary hour profiles.
- ev_anomaly_mad's doubled-median trick: 2x the interpolated median
  of integers is always integral, and the 3-MAD flag in halves
  matches the float rule.
- ev_attribution_removal's value iteration on the 1e-6 grid with
  truncating division: Spark/DuckDB/Python agree chain-exactly, and
  the bounded-horizon absorption converges from below.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


DAY = st.tuples(st.integers(1, 100_000),      # n_events
                st.integers(0, 100_000))      # n_errors (clamped below)


@settings(max_examples=25, deadline=None)
@given(st.lists(DAY, min_size=2, max_size=12))
def test_pchart_integer_flag_matches_float(days):
    days = [(n, min(o, n)) for n, o in days]
    nn = sum(n for n, _ in days)
    oo = sum(o for _, o in days)
    if oo == 0 or oo == nn:
        return  # degenerate center line: band is zero on both forms
    p = oo / nn
    for n_d, o_d in days:
        dev = o_d * nn - oo * n_d
        int_flag = dev * dev > 9 * oo * (nn - oo) * n_d
        band = 3 * math.sqrt(p * (1 - p) / n_d)
        lhs = abs(o_d / n_d - p)
        if abs(lhs - band) > 1e-9 * max(band, 1e-12):
            assert int_flag == (lhs > band), (n_d, o_d, nn, oo)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 50_000), min_size=24, max_size=24))
def test_chi2_numerator_matches_float(hours):
    t = sum(hours)
    if t == 0:
        return
    num = sum((24 * o - t) ** 2 for o in hours if o > 0) \
        + sum(t * t for o in hours if o == 0)
    e = t / 24
    chi2 = sum((o - e) ** 2 / e for o in hours)
    assert abs(num / (24 * t) - chi2) < 1e-6 * max(chi2, 1.0)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=2, max_size=40))
def test_doubled_median_is_integral_and_flag_matches(counts):
    con = duckdb.connect()
    med2 = con.execute(
        "SELECT round(quantile_cont(x, 0.5) * 2) FROM "
        "(SELECT unnest(?) AS x)", [counts]).fetchone()[0]
    assert med2 == int(med2), "2x interpolated integer median drifts"
    med2 = int(med2)
    devs = [abs(2 * c - med2) for c in counts]
    mad2 = int(con.execute(
        "SELECT round(quantile_cont(x, 0.5)) FROM "
        "(SELECT unnest(?) AS x)", [devs]).fetchone()[0])
    import statistics
    med = statistics.median(counts)
    mad = statistics.median(abs(c - med) for c in counts)
    for c in counts:
        int_flag = abs(2 * c - med2) * 10 > 30 * max(mad2, 1)
        float_rule = abs(c - med) > 3 * max(mad, 0.5)
        if abs(abs(c - med) - 3 * max(mad, 0.5)) > 1e-9:
            assert int_flag == float_rule, (c, med, mad)


TRANS = st.lists(
    st.tuples(st.sampled_from(["a", "b", "START"]),
              st.sampled_from(["a", "b", "purchase", "END"]),
              st.integers(1, 1000)),
    min_size=1, max_size=12)


@settings(max_examples=25, deadline=None)
@given(TRANS)
def test_attribution_grid_iteration_engine_exact(trans):
    # collapse duplicate (s, t) pairs the way a groupBy would
    agg = {}
    for s, t, c in trans:
        if s == t:
            continue
        agg[(s, t)] = agg.get((s, t), 0) + c
    if not agg:
        return
    states = sorted({s for s, _ in agg})
    rs = {s: sum(c for (s2, _), c in agg.items() if s2 == s)
          for s in states}
    G = 1_000_000

    def py_iterate(L):
        q = {s: 0 for s in states}
        for _ in range(L):
            q = {s: sum(c * (G if t == "purchase" else q.get(t, 0))
                        for (s2, t), c in agg.items() if s2 == s)
                 // rs[s] for s in states}
        return q

    q4, q5 = py_iterate(4), py_iterate(5)
    # bounded-horizon absorption converges FROM BELOW (every extra
    # step can only discover more purchase paths)
    for s in states:
        assert q5[s] >= q4[s]
        assert 0 <= q4[s] <= G
    # DuckDB truncating // on the same grid walks the same chain
    con = duckdb.connect()
    rows = ", ".join(f"('{s}', '{t}', {c})" for (s, t), c in agg.items())
    prev = "SELECT s, 0::BIGINT AS q FROM (SELECT DISTINCT s FROM tr) d"
    for _ in range(4):
        prev = f"""
SELECT r.s,
       coalesce(CAST(sum(tr.c * (CASE WHEN tr.t = 'purchase' THEN {G}
                ELSE coalesce(p.q, 0) END)) AS BIGINT), 0) // r.rs AS q
FROM (SELECT s, CAST(sum(c) AS BIGINT) AS rs FROM tr GROUP BY s) r
LEFT JOIN tr ON tr.s = r.s
LEFT JOIN ({prev}) p ON p.s = tr.t
GROUP BY r.s, r.rs"""
    duck = dict(con.execute(
        f"WITH tr(s, t, c) AS (VALUES {rows}) {prev}").fetchall())
    assert duck == q4
