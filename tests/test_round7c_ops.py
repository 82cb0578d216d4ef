"""Invariant + reference-pinning tests for the round-7 fifth-wave
operators (HITS, Kendall τ-b, isotonic PAV calibration). The DuckDB
parity sweep proves Spark ≡ SQL; these pin that the MATH does what
each operator claims, against brute-force pure-Python references on
the same parquet inputs."""

from __future__ import annotations

import duckdb
import os

import pyspark.sql.functions as F


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    return con


def test_hits_matches_numpy_power_iteration(spark, sf_small):
    """The Spark HITS iterates must equal a dense numpy replay of the
    same 3-round L1-normalized recurrence on the same edge list (to
    rounding), and scores must be valid L1-normalized masses."""
    import numpy as np

    from cricket_analytics_nosql_spark.operators.graph import (
        hits_hub_authority,
        trade_edges,
    )

    edges = [
        (r.src, r.dst)
        for r in trade_edges(spark, sf_small).select("src", "dst").collect()
    ]
    custs = sorted({c for c, _ in edges})
    supps = sorted({s for _, s in edges})
    ci = {c: i for i, c in enumerate(custs)}
    si = {s: i for i, s in enumerate(supps)}
    a_mat = np.zeros((len(custs), len(supps)))
    for c, s in edges:
        a_mat[ci[c], si[s]] = 1.0
    hub = np.ones(len(custs))
    for _ in range(3):
        auth = a_mat.T @ hub
        auth /= auth.sum()
        hub = a_mat @ auth
        hub /= hub.sum()

    rows = hits_hub_authority(spark, sf_small).collect()
    assert len(rows) == 20
    by_role = {"authority": {}, "hub": {}}
    for r in rows:
        by_role[r.role][r.key] = r.score
    for key, score in by_role["authority"].items():
        assert abs(score - auth[si[key]]) < 1e-5, (key, score)
    for key, score in by_role["hub"].items():
        assert abs(score - hub[ci[key]]) < 1e-5, (key, score)
    # top-10 per role really is the top-10 of the reference vector
    ref_top_auth = sorted(auth, reverse=True)[:10]
    got_auth = sorted(by_role["authority"].values(), reverse=True)
    assert all(
        abs(g - r) < 1e-5 for g, r in zip(got_auth, ref_top_auth)
    )


def test_kendall_matches_bruteforce(spark, sf_small):
    """τ-b from the grid rollup must equal the O(n²) textbook pair
    count on the raw rows (run on the sf0.001 slice where n² is
    tractable), including the tie correction."""
    from cricket_analytics_nosql_spark.operators.drift import (
        kendall_tau_discount_qty,
    )

    import numpy as np

    con = _duck(sf_small)
    xs, ys = (
        np.array(col)
        for col in zip(
            *con.execute(
                "SELECT CAST(ROUND(l_discount*100) AS BIGINT), "
                "CAST(l_quantity AS BIGINT) FROM lineitem"
            ).fetchall()
        )
    )
    n = len(xs)
    conc = disc = tie_x = tie_y = 0
    for lo in range(0, n, 512):  # chunked O(n²) outer comparison
        hi = min(lo + 512, n)
        dx = np.sign(xs[lo:hi, None] - xs[None, :])
        dy = np.sign(ys[lo:hi, None] - ys[None, :])
        # count each unordered pair once: columns strictly after row
        mask = np.arange(n)[None, :] > np.arange(lo, hi)[:, None]
        conc += int(((dx * dy > 0) & mask).sum())
        disc += int(((dx * dy < 0) & mask).sum())
        tie_x += int(((dx == 0) & mask).sum())
        tie_y += int(((dy == 0) & mask).sum())
    n0 = n * (n - 1) // 2
    import math

    ref_tau = (conc - disc) / math.sqrt((n0 - tie_x) * (n0 - tie_y))

    r = kendall_tau_discount_qty(spark, sf_small).collect()[0]
    assert r.n == n
    assert r.concordant == conc
    assert r.discordant == disc
    assert abs(r.tau_b - ref_tau) < 1e-6


def test_isotonic_is_monotone_and_matches_pav(spark, sf_small):
    """The min-max identity must produce (a) a non-decreasing fit,
    (b) the same values as the sequential pool-adjacent-violators
    sweep, and (c) a weighted mean equal to the raw rate mean (PAV
    preserves the weighted total)."""
    from cricket_analytics_nosql_spark.operators.text import (
        isotonic_calibration_langid,
    )

    rows = isotonic_calibration_langid(spark, sf_small).orderBy("bin").collect()
    assert rows
    iso = [r.iso_rate for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:])), iso

    # sequential PAV on the same (n_pos, n_docs) bins
    blocks = [[r.n_pos, r.n_docs] for r in rows]  # mutable [num, den]
    out: list[list[float]] = []
    for num, den in blocks:
        cur = [float(num), float(den)]
        while out and out[-1][0] * cur[1] >= cur[0] * out[-1][1]:
            prev = out.pop()
            cur = [prev[0] + cur[0], prev[1] + cur[1]]
        out.append(cur)
    ref: list[float] = []
    for num, den in out:
        # den is the pooled doc count; the pooled rate repeats over
        # the pooled span (count spans by re-walking the widths)
        ref.append((num, den))
    # expand pooled blocks back to per-bin fitted values
    expanded = []
    idx = 0
    for num, den in ref:
        total = 0
        while total < den - 1e-9:
            total += rows[idx].n_docs
            expanded.append(num / den)
            idx += 1
    assert len(expanded) == len(rows)
    for got, want in zip(iso, expanded):
        assert abs(got - want) < 1e-6, (iso, expanded)

    # weighted totals preserved
    w_raw = sum(r.n_pos for r in rows)
    w_fit = sum(r.iso_rate * r.n_docs for r in rows)
    assert abs(w_fit - w_raw) < 1e-3 * max(1, w_raw)


def test_naive_bayes_confusion_partitions_test_docs(spark, sf_small):
    """Confusion-matrix cells must partition the held-out docs
    exactly (every test doc predicted exactly once), and every
    predicted label must come from the training label set."""
    from cricket_analytics_nosql_spark.operators.text import (
        NB_SPLIT_MOD,
        naive_bayes_langid,
    )

    rows = naive_bayes_langid(spark, sf_small).collect()
    con = _duck(sf_small)
    n_test, langs = con.execute(
        "SELECT COUNT(*) FILTER (CAST(('0x' || substr(md5('nbsplit' || "
        f"CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {NB_SPLIT_MOD} = 0),"
        " COUNT(DISTINCT lang) FROM documents"
    ).fetchone()
    assert sum(r.n_docs for r in rows) == n_test
    lang_set = {
        r[0]
        for r in con.execute("SELECT DISTINCT lang FROM documents").fetchall()
    }
    assert {r.pred_lang for r in rows} <= lang_set
    assert {r.true_lang for r in rows} <= lang_set


def test_butterfly_matches_supplier_side_bruteforce(spark, sf_small):
    """B = Σ_{s1<s2} C(|N(s1)∩N(s2)|, 2)... the supplier-side count
    of the SAME motif must equal the customer-side identity the
    operator uses — a genuinely independent recount."""
    from itertools import combinations

    from cricket_analytics_nosql_spark.operators.graph import (
        AA_MAX_DEG,
        AA_MIN_WEIGHT,
        butterfly_count,
    )

    con = _duck(sf_small)
    edges = con.execute(
        "SELECT o_custkey, l_suppkey FROM lineitem JOIN orders"
        " ON l_orderkey = o_orderkey GROUP BY 1, 2"
        f" HAVING COUNT(*) >= {AA_MIN_WEIGHT}"
    ).fetchall()
    nbrs: dict[int, set[int]] = {}
    for c, s in edges:
        nbrs.setdefault(s, set()).add(c)
    kept = {s: cs for s, cs in nbrs.items() if 2 <= len(cs) <= AA_MAX_DEG}
    ref_b = 0
    for s1, s2 in combinations(sorted(kept), 2):
        shared = len(kept[s1] & kept[s2])
        ref_b += shared * (shared - 1) // 2
    r = butterfly_count(spark, sf_small).collect()[0]
    assert r.n_butterflies == ref_b
    assert r.n_wedges >= r.n_pairs  # codeg ≥ 1 per pair
    assert r.n_edges == sum(len(cs) for cs in nbrs.values())


def test_ljung_box_consistent_with_acf_profile(spark, sf_small):
    """Q recomputed from the published (rounded) ACF profile must
    match the operator's Q to rounding tolerance — the two operators
    must describe the same series."""
    from cricket_analytics_nosql_spark.operators.drift import (
        ljung_box_revenue,
        revenue_acf_profile,
    )

    acf = {r.lag: r.acf for r in revenue_acf_profile(spark, sf_small).collect()}
    r = ljung_box_revenue(spark, sf_small).collect()[0]
    n = r.n_days
    q_ref = n * (n + 2) * sum(
        acf[k] ** 2 / (n - k) for k in sorted(acf)
    )
    assert abs(r.q_stat - q_ref) < 1e-2
    assert r.df == len(acf)
    assert r.reject_white_noise == (r.q_stat > 14.067140)


def test_chi2_select_matches_python_contingency(spark, sf_small):
    """Each reported χ² must equal the textbook 2×2 formula computed
    in Python from an independent DuckDB contingency build."""
    from cricket_analytics_nosql_spark.operators.text import (
        NB_BUCKETS,
        chi2_feature_select,
    )

    con = _duck(sf_small)
    cells = dict()
    for b, a, nb in con.execute(
        "SELECT CAST(('0x' || substr(md5('nbfeat' || tok), 1, 8)) AS BIGINT)"
        f" % {NB_BUCKETS} AS b,"
        " SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), COUNT(*)"
        " FROM documents, UNNEST(string_split(text, ' ')) u(tok) GROUP BY b"
    ).fetchall():
        cells[b] = (int(a), int(nb - a))
    tot_a = sum(a for a, _ in cells.values())
    tot_b = sum(bb for _, bb in cells.values())
    for r in chi2_feature_select(spark, sf_small).collect():
        a, bb = cells[r.bucket]
        c, d = tot_a - a, tot_b - bb
        t = a + bb + c + d
        ref = t * (a * d - bb * c) ** 2 / ((a + bb) * (c + d) * (a + c) * (bb + d))
        assert abs(r.chi2 - ref) < 1e-5
        assert r.n_tokens == a + bb and r.n_en == a


def test_kruskal_matches_python_ranks(spark, sf_small):
    """H (tie-adjusted) must match a pure-Python average-rank
    computation on the same cent-quantized values."""
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.drift import (
        kruskal_wallis_priority,
    )

    con = _duck(sf_small)
    rows = con.execute(
        "SELECT o_orderpriority, CAST(ROUND(o_totalprice*100) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    vals = sorted(v for _, v in rows)
    # average rank per distinct value
    avg_rank, i = {}, 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        avg_rank[vals[i]] = (i + 1 + j) / 2  # mean of ranks i+1..j
        i = j
    by_p = defaultdict(list)
    for p, v in rows:
        by_p[p].append(avg_rank[v])
    n = len(rows)
    h = 12 / (n * (n + 1)) * sum(
        sum(rs) ** 2 / len(rs) for rs in by_p.values()
    ) - 3 * (n + 1)
    # tie correction
    from collections import Counter

    tc = Counter(vals)
    c = 1 - sum(t**3 - t for t in tc.values()) / (n**3 - n)
    r = kruskal_wallis_priority(spark, sf_small).collect()[0]
    assert r.n == n and r.k == len(by_p)
    assert abs(r.h_stat - h) < 1e-4
    assert abs(r.h_adj - h / c) < 1e-4


def test_jarque_bera_matches_numpy_moments(spark, sf_small):
    """Skewness/kurtosis/JB must match numpy population moments on
    the same dollar values to quantization tolerance (the operator
    quantizes per-row moment terms to integer units)."""
    import numpy as np

    from cricket_analytics_nosql_spark.operators.drift import (
        jarque_bera_orders,
    )

    con = _duck(sf_small)
    x = np.array(
        [
            v / 100
            for (v,) in con.execute(
                "SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
            ).fetchall()
        ]
    )
    cx = x - x.mean()
    m2, m3, m4 = (cx**2).mean(), (cx**3).mean(), (cx**4).mean()
    s_ref = m3 / m2**1.5
    k_ref = m4 / m2**2 - 3
    jb_ref = len(x) / 6 * (s_ref**2 + k_ref**2 / 4)
    r = jarque_bera_orders(spark, sf_small).collect()[0]
    assert r.n == len(x)
    assert abs(r.skewness - s_ref) < 1e-4
    assert abs(r.ex_kurtosis - k_ref) < 1e-4
    assert abs(r.jb_stat - jb_ref) < max(1.0, 1e-3 * jb_ref)
    assert r.reject_normal == (r.jb_stat > 5.991465)


def test_stream_cusum_matches_sequential_recursion(spark, sf_small):
    """The running-min identity must equal the textbook sequential
    CUSUM S_t = max(0, S_{t-1} + dev_t) replayed in Python on the
    same drained day counts."""
    from collections import defaultdict

    from cricket_analytics_nosql_spark.streaming.events import (
        stream_cusum_monitor,
    )

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_small}/events.parquet')"
    )
    rows = con.execute(
        "SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,"
        " COUNT(*) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    by_type = defaultdict(list)
    for et, day, n in rows:
        by_type[et].append((day, n))
    got = {
        r.event_type: r
        for r in stream_cusum_monitor(spark, sf_small).collect()
    }
    for et, series in by_type.items():
        d_cnt = len(series)
        total = sum(n for _, n in series)
        s, peak, peak_day = 0, 0, series[0][0]
        for day, n in series:
            s = max(0, s + (n * d_cnt - total))
            if s > peak:
                peak, peak_day = s, day
        r = got[et]
        assert r.n_days == d_cnt and r.total == total
        assert abs(r.peak_excess_events - peak / d_cnt) < 1e-6
        if peak > 0:
            assert r.changepoint_day == peak_day
        assert r.alert == (2 * peak > total)


def test_cochran_armitage_matches_python(spark, sf_small):
    """Z² must equal the textbook CA statistic computed from the
    per-tick contingency in Python."""
    from cricket_analytics_nosql_spark.operators.drift import (
        cochran_armitage_trend,
    )

    con = _duck(sf_small)
    cells = con.execute(
        "SELECT CAST(ROUND(l_discount*100) AS BIGINT) AS t,"
        " SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END), COUNT(*)"
        " FROM lineitem GROUP BY t"
    ).fetchall()
    n = sum(nt for _, _, nt in cells)
    a = sum(at for _, at, _ in cells)
    stn = sum(t * nt for t, _, nt in cells)
    st2n = sum(t * t * nt for t, _, nt in cells)
    sta = sum(t * at for t, at, _ in cells)
    d = n * sta - a * stn
    z2 = n * d * d / (a * (n - a) * (n * st2n - stn * stn))
    r = cochran_armitage_trend(spark, sf_small).collect()[0]
    assert r.n == n and r.n_returned == a
    assert abs(r.z2_stat - z2) < 1e-5
    assert r.trend_sign == (1 if d > 0 else (-1 if d < 0 else 0))


def test_mantel_haenszel_matches_python(spark, sf_small):
    """OR_MH and CMH must match a per-brand Python pooling of the
    same 2×2 tables."""
    from cricket_analytics_nosql_spark.operators.drift import (
        mantel_haenszel_returns,
    )

    con = _duck(sf_small)
    con.execute(
        "CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_small, 'part')}.parquet')"
    )
    strata = con.execute(
        "SELECT p_brand,"
        " SUM(CASE WHEN d >= 6 AND ret THEN 1 ELSE 0 END),"
        " SUM(CASE WHEN d >= 6 AND NOT ret THEN 1 ELSE 0 END),"
        " SUM(CASE WHEN d < 6 AND ret THEN 1 ELSE 0 END),"
        " SUM(CASE WHEN d < 6 AND NOT ret THEN 1 ELSE 0 END)"
        " FROM (SELECT l_partkey,"
        "              CAST(ROUND(l_discount*100) AS BIGINT) AS d,"
        "              l_returnflag = 'R' AS ret FROM lineitem) li"
        " JOIN part p ON li.l_partkey = p.p_partkey GROUP BY p_brand"
    ).fetchall()
    s_ad = s_bc = s_a = s_e = s_v = 0.0
    for _, a, b, c, d in strata:
        a, b, c, d = int(a), int(b), int(c), int(d)
        n = a + b + c + d
        s_ad += a * d / n
        s_bc += b * c / n
        s_a += a
        s_e += (a + b) * (a + c) / n
        s_v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    r = mantel_haenszel_returns(spark, sf_small).collect()[0]
    assert r.n_strata == len(strata)
    assert abs(r.or_mh - s_ad / s_bc) < 1e-5
    ref_cmh = (s_a - s_e) ** 2 / s_v
    assert abs(r.cmh_chi2 - ref_cmh) < 1e-5
    assert r.reject_no_assoc == (r.cmh_chi2 > 3.841459)


def test_brown_forsythe_matches_python(spark, sf_small):
    """F must equal the textbook BF computation (median-centered,
    dollar-quantized deviations) replayed in Python."""
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.drift import (
        brown_forsythe_priority,
    )

    con = _duck(sf_small)
    rows = con.execute(
        "SELECT o_orderpriority, CAST(ROUND(o_totalprice*100) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    by_p = defaultdict(list)
    for p, v in rows:
        by_p[p].append(v)
    zs = defaultdict(list)
    for p, vs in by_p.items():
        vs.sort()
        # type-1 lower median: first value with 2*cum >= n
        cum, med = 0, None
        n = len(vs)
        prev = None
        for i, v in enumerate(vs):
            if 2 * (i + 1) >= n:
                med = v
                break
        for v in vs:
            zs[p].append(abs(v - med) // 100)
    n = sum(len(z) for z in zs.values())
    k = len(zs)
    s = sum(sum(z) for z in zs.values())
    q = sum(sum(x * x for x in z) for z in zs.values())
    s2n = sum(sum(z) ** 2 / len(z) for z in zs.values())
    between = s2n - s * s / n
    within = q - s2n
    f_ref = (between / (k - 1)) / (within / (n - k))
    r = brown_forsythe_priority(spark, sf_small).collect()[0]
    assert r.n == n and r.k == k
    assert abs(r.f_stat - f_ref) < 1e-5


def test_wasserstein_matches_python_cdf_integral(spark, sf_small):
    """W₁ must equal the sorted-CDF integral computed in Python on
    the same cent values (scipy-free reference)."""
    from cricket_analytics_nosql_spark.operators.drift import (
        KS_GROUP_A,
        KS_GROUP_B,
        wasserstein_drift_orders,
    )

    con = _duck(sf_small)
    a = sorted(
        v
        for (v,) in con.execute(
            "SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
            f" WHERE o_orderpriority = '{KS_GROUP_A}'"
        ).fetchall()
    )
    b = sorted(
        v
        for (v,) in con.execute(
            "SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
            f" WHERE o_orderpriority = '{KS_GROUP_B}'"
        ).fetchall()
    )
    grid = sorted(set(a) | set(b))
    import bisect

    w1 = 0.0
    for v, v_next in zip(grid, grid[1:]):
        fa = bisect.bisect_right(a, v) / len(a)
        fb = bisect.bisect_right(b, v) / len(b)
        w1 += abs(fa - fb) * (v_next - v) / 100
    r = wasserstein_drift_orders(spark, sf_small).collect()[0]
    assert r.n_a == len(a) and r.n_b == len(b)
    assert abs(r.w1_dollars - w1) < 1e-4


def test_markov_eval_matches_python_fit(spark, sf_small):
    """The fitted argmax model and held-out hit counts must match a
    Python replay of the same split/fit/score."""
    from collections import Counter, defaultdict

    from cricket_analytics_nosql_spark.operators.sequences import (
        MARKOV_EVAL_MOD,
        markov_next_event_eval,
    )

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_small}/events.parquet')"
    )
    rows = con.execute(
        "SELECT user_id, event_type,"
        " LEAD(event_type) OVER (PARTITION BY user_id"
        "                        ORDER BY ts, event_id),"
        " CAST(('0x' || substr(md5('mkveval' || CAST(user_id AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % {MARKOV_EVAL_MOD} = 0"
        " FROM events"
    ).fetchall()
    train, test = Counter(), defaultdict(list)
    for _, prev, nxt, is_test in rows:
        if nxt is None:
            continue
        if is_test:
            test[prev].append(nxt)
        else:
            train[(prev, nxt)] += 1
    model = {}
    for (prev, nxt), c in train.items():
        best = model.get(prev)
        if best is None or (c, ) > (best[1], ) or (c == best[1] and nxt < best[0]):
            if best is None or c > best[1] or (c == best[1] and nxt < best[0]):
                model[prev] = (nxt, c)
    got = {r.prev: r for r in markov_next_event_eval(spark, sf_small).collect()}
    for prev, (pred, _) in model.items():
        r = got[prev]
        assert r.predicted_next == pred
        assert r.n_transitions == len(test[prev])
        assert r.n_hits == sum(1 for x in test[prev] if x == pred)


def test_diebold_mariano_matches_python(spark, sf_small):
    """DM must equal the Python replay on the same integer-dollar
    day series."""
    import math

    from cricket_analytics_nosql_spark.operators.drift import (
        diebold_mariano_backtest,
    )

    con = _duck(sf_small)
    series = [
        x
        for (_, x) in con.execute(
            "SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP))"
            " // 86400000000 AS BIGINT) AS d,"
            " CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT) // 100)"
            " AS BIGINT) FROM orders GROUP BY d ORDER BY d"
        ).fetchall()
    ]
    ds = [
        abs(series[i] - series[i - 1]) - abs(series[i] - series[i - 7])
        for i in range(7, len(series))
    ]
    t = len(ds)
    mean = sum(ds) / t
    var = sum(x * x for x in ds) / t - mean**2
    dm_ref = mean / math.sqrt(var / t)
    r = diebold_mariano_backtest(spark, sf_small).collect()[0]
    assert r.t == t
    assert abs(r.dm_stat - dm_ref) < 1e-5
    assert abs(r.mean_abs_err_gap - mean) < 1e-4


def test_good_turing_matches_python_count_of_counts(spark, sf_small):
    """Every N_r, raw mass and Good-Turing reassigned mass must equal
    a pure-Python count-of-counts over the same whitespace tokens;
    the r = 0 row must carry the N1/N unseen-mass estimate."""
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.text import (
        GT_MAX_R,
        good_turing_mass,
    )

    con = _duck(sf_small)
    freq = Counter()
    for (txt,) in con.execute("SELECT text FROM documents").fetchall():
        freq.update(txt.split(" "))
    cc = Counter(freq.values())
    n = sum(r * nr for r, nr in cc.items())
    rows = {r.r: r for r in good_turing_mass(spark, sf_small).collect()}
    assert sorted(rows) == list(range(GT_MAX_R + 1))
    for r in range(GT_MAX_R + 1):
        got = rows[r]
        assert (got.n_types or 0) == cc.get(r, 0)
        assert abs(got.raw_mass - round(r * cc.get(r, 0) / n, 6)) < 1e-9
        assert (
            abs(got.gt_mass - round((r + 1) * cc.get(r + 1, 0) / n, 6))
            < 1e-9
        )
    # the headline number: P(next token unseen) = N1/N
    assert abs(rows[0].gt_mass - round(cc.get(1, 0) / n, 6)) < 1e-9
    assert rows[0].raw_mass == 0.0


def test_burrows_delta_matches_python_stylometry(spark, sf_small):
    """Each pairwise Delta must equal the textbook computation —
    z-scored top-k relative word frequencies, mean absolute gap —
    done in pure Python from the same corpus, and must be a
    symmetric non-negative distance over all source pairs."""
    import math
    from collections import Counter, defaultdict

    from cricket_analytics_nosql_spark.operators.text import (
        BURROWS_TOPK,
        burrows_delta_sources,
    )

    con = _duck(sf_small)
    per_src = defaultdict(Counter)
    for src, txt in con.execute(
        "SELECT source, text FROM documents"
    ).fetchall():
        per_src[src].update(txt.split(" "))
    glob = Counter()
    for c in per_src.values():
        glob.update(c)
    topk = [
        w
        for w, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BURROWS_TOPK
        ]
    ]
    srcs = sorted(per_src)
    f = {
        s: {
            w: per_src[s][w] / sum(per_src[s].values()) for w in topk
        }
        for s in srcs
    }
    z = {}
    for w in topk:
        vals = [f[s][w] for s in srcs]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(sum(v * v for v in vals) / len(vals) - mu * mu)
        for s in srcs:
            z[(s, w)] = (f[s][w] - mu) / sd
    got = {
        (r.s1, r.s2): r.delta
        for r in burrows_delta_sources(spark, sf_small).collect()
    }
    expected_pairs = {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]
    }
    assert set(got) == expected_pairs
    for (s1, s2), d in got.items():
        ref = sum(abs(z[(s1, w)] - z[(s2, w)]) for w in topk) / len(topk)
        assert abs(d - ref) < 1e-5
        assert d >= 0.0


def test_mann_kendall_matches_python_pairs(spark, sf_small):
    """S, τ_a, Var(S) and Z must equal a pure-Python O(n²) pair scan
    over the same exact-cents daily revenue series."""
    import math

    from cricket_analytics_nosql_spark.operators.drift import (
        mann_kendall_trend,
    )

    con = _duck(sf_small)
    days = [
        c
        for (_, c) in con.execute(
            "SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000"
            " AS d, SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))"
            " FROM orders GROUP BY d ORDER BY d"
        ).fetchall()
    ]
    n = len(days)
    s = sum(
        (days[j] > days[i]) - (days[j] < days[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(days).values()
    )
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18
    z = (s - 1) / math.sqrt(var) if s > 0 else (
        (s + 1) / math.sqrt(var) if s < 0 else 0.0
    )
    r = mann_kendall_trend(spark, sf_small).collect()[0]
    assert r.n_days == n and r.s_stat == s
    assert abs(r.tau_a - s / (n * (n - 1) / 2)) < 1e-6
    assert abs(r.var_s - var) < 1e-3
    assert abs(r.z_stat - z) < 1e-5


def test_cvm_matches_python_ecdf_integral(spark, sf_small):
    """The CvM criterion must equal a pure-Python integral of the
    squared ECDF gap over every combined observation."""
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.drift import (
        KS_GROUP_A,
        KS_GROUP_B,
        cvm_drift_orders,
    )

    con = _duck(sf_small)
    rows = con.execute(
        "SELECT o_orderpriority, CAST(ROUND(o_totalprice*100) AS BIGINT)"
        f" // 100 FROM orders WHERE o_orderpriority IN"
        f" ('{KS_GROUP_A}', '{KS_GROUP_B}')"
    ).fetchall()
    a = Counter(v for p, v in rows if p == KS_GROUP_A)
    b = Counter(v for p, v in rows if p == KS_GROUP_B)
    n, m = sum(a.values()), sum(b.values())
    cum_a = cum_b = 0
    u = 0
    for v in sorted(set(a) | set(b)):
        cum_a += a.get(v, 0)
        cum_b += b.get(v, 0)
        d = cum_a * m - cum_b * n
        u += d * d * (a.get(v, 0) + b.get(v, 0))
    t_ref = u / (n * m * (n + m) * (n + m))
    r = cvm_drift_orders(spark, sf_small).collect()[0]
    assert (r.n_a, r.n_b) == (n, m)
    assert abs(r.cvm_stat - t_ref) < 1e-6


def test_gumbel_fit_matches_python_moments(spark, sf_small):
    """μ̂, β̂ and the p99 return level must equal the textbook
    method-of-moments fit on the same monthly maxima."""
    import math
    import statistics

    from cricket_analytics_nosql_spark.operators.drift import (
        GUMBEL_EULER,
        gumbel_maxima_fit,
    )

    con = _duck(sf_small)
    xs = [
        x
        for (_, x) in con.execute(
            "SELECT mo, MAX(c) // 100000 FROM ("
            " SELECT year(o_orderdate)*12 + month(o_orderdate) AS mo,"
            " epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS d,"
            " SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS c"
            " FROM orders GROUP BY mo, d) GROUP BY mo"
        ).fetchall()
    ]
    mean = sum(xs) / len(xs)
    sd = statistics.stdev(xs)
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - GUMBEL_EULER * beta
    rl = mu - beta * math.log(-math.log(0.99))
    r = gumbel_maxima_fit(spark, sf_small).collect()[0]
    assert r.n_months == len(xs)
    assert abs(r.mean_max_kusd - mean) < 1e-5
    assert abs(r.beta_kusd - beta) < 1e-4
    assert abs(r.mu_kusd - mu) < 1e-4
    assert abs(r.return_level_p99 - rl) < 1e-3


def test_ams_f2_matches_python_sketch_replay(spark, sf_small):
    """The AMS estimate must equal a pure-Python replay of the same
    md5-signed tug-of-war, and the exact F2 must match a Counter."""
    import hashlib
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.sketches import (
        AMS_G,
        AMS_J,
        ams_f2_sketch,
    )

    con = _duck(sf_small)
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{os.path.join(sf_small, 'events')}.parquet')"
    )
    users = [u for (u,) in con.execute("SELECT user_id FROM events").fetchall()]
    freq = Counter(users)
    f2 = sum(c * c for c in freq.values())

    def sign(j, u):
        h = int(hashlib.md5(f"ams{j}#{u}".encode()).hexdigest()[:8], 16)
        return 1 if h % 2 == 0 else -1

    zs = [
        sum(sign(j, u) * c for u, c in freq.items()) for j in range(AMS_J)
    ]
    qs = sorted(
        sum(zs[g * AMS_G + i] ** 2 for i in range(AMS_G))
        for g in range(AMS_J // AMS_G)
    )
    est = (qs[1] + qs[2]) / (2.0 * AMS_G)
    r = ams_f2_sketch(spark, sf_small).collect()[0]
    assert r.n_events == len(users)
    assert r.f2_exact == f2
    assert abs(r.f2_est - round(est, 2)) < 1e-6
    assert abs(r.rel_err - round((est - f2) / f2, 6)) < 1e-6


def test_gini_stump_is_the_bruteforce_argmin(spark, sf_small):
    """The reported split must minimize weighted Gini over EVERY
    candidate threshold in a brute-force Python scan, with exact
    contingency counts."""
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.training import (
        gini_stump_split,
    )

    con = _duck(sf_small)
    rows = con.execute(
        "SELECT len(string_split(text, ' ')),"
        " CASE WHEN lang = 'en' THEN 1 ELSE 0 END FROM documents"
    ).fetchall()
    n = len(rows)
    e_tot = sum(e for _, e in rows)
    cnt, pos = Counter(), Counter()
    for l, e in rows:
        cnt[l] += 1
        pos[l] += e
    best = None
    n_l = e_l = 0
    for l in sorted(cnt):
        n_l += cnt[l]
        e_l += pos[l]
        if n_l == n:
            continue
        n_r, e_r = n - n_l, e_tot - e_l
        g = (
            e_l * (n_l - e_l) * n_r + e_r * (n_r - e_r) * n_l
        ) / (n_l * n_r) * 2.0 / n
        if best is None or g < best[0] - 1e-15:
            best = (g, l, n_l, e_l, n_r, e_r)
    r = gini_stump_split(spark, sf_small).collect()[0]
    assert r.split_len == best[1]
    assert (r.n_left, r.en_left, r.n_right, r.en_right) == best[2:]
    assert abs(r.gini_split - best[0]) < 1e-6
    parent = 2.0 * e_tot * (n - e_tot) / (n * n)
    assert abs(r.gini_parent - parent) < 1e-6


def test_lexical_richness_matches_python_counters(spark, sf_small):
    """TTR, hapax share, Yule's K, Simpson's D and Chao1 must equal
    pure-Python Counter arithmetic per source."""
    from collections import Counter, defaultdict

    from cricket_analytics_nosql_spark.operators.text import (
        lexical_richness_profile,
    )

    con = _duck(sf_small)
    per_src = defaultdict(Counter)
    for src, txt in con.execute(
        "SELECT source, text FROM documents"
    ).fetchall():
        per_src[src].update(t for t in txt.split(" ") if t)
    got = {r.source: r for r in lexical_richness_profile(spark, sf_small).collect()}
    assert sorted(got) == sorted(per_src)
    for s, c in per_src.items():
        n = sum(c.values())
        types = len(c)
        n1 = sum(1 for v in c.values() if v == 1)
        n2 = sum(1 for v in c.values() if v == 2)
        c2 = sum(v * v for v in c.values())
        r = got[s]
        assert (r.n_tok, r.n_types, r.n1) == (n, types, n1)
        assert abs(r.ttr - types / n) < 1e-6
        assert abs(r.hapax_share - n1 / types) < 1e-6
        assert abs(r.yule_k - 1e4 * (c2 - n) / (n * n)) < 1e-6
        assert abs(r.simpson_d - (c2 - n) / (n * (n - 1))) < 1e-6
        assert abs(r.chao1 - (types + n1 * (n1 - 1) / (2 * (n2 + 1)))) < 1e-5


def test_jsd_matches_python_full_union(spark, sf_small):
    """The shared-mass decomposition must equal a direct full-union
    JSD in Python (within micro-nat quantization), stay in
    [0, ln 2], and cover every source pair."""
    import math
    from collections import Counter, defaultdict

    from cricket_analytics_nosql_spark.operators.text import (
        jsd_source_divergence,
    )

    con = _duck(sf_small)
    per_src = defaultdict(Counter)
    for src, txt in con.execute(
        "SELECT source, text FROM documents"
    ).fetchall():
        per_src[src].update(t for t in txt.split(" ") if t)
    srcs = sorted(per_src)
    got = {
        (r.s1, r.s2): r
        for r in jsd_source_divergence(spark, sf_small).collect()
    }
    assert set(got) == {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]
    }
    for (s1, s2), r in got.items():
        ca, cb = per_src[s1], per_src[s2]
        n1, n2 = sum(ca.values()), sum(cb.values())
        jsd = 0.0
        for t in set(ca) | set(cb):
            p, q = ca.get(t, 0) / n1, cb.get(t, 0) / n2
            m = (p + q) / 2
            if p:
                jsd += 0.5 * p * math.log(p / m)
            if q:
                jsd += 0.5 * q * math.log(q / m)
        assert abs(r.jsd_nats - jsd) < 1e-4
        assert 0.0 <= r.jsd_nats <= math.log(2) + 1e-9
        assert r.shared_types == len(set(ca) & set(cb))


def test_kfold_nb_cv_matches_python_replay(spark, sf_small):
    """Per-fold accuracy must equal a full pure-Python replay of the
    leave-fold-out training, micro-nat weights, and argmax."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    from cricket_analytics_nosql_spark.operators.text import (
        CV_FOLDS,
        NB_BUCKETS,
        kfold_nb_cv,
    )

    def h(salt, key):
        return int(
            hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16
        )

    con = _duck(sf_small)
    docs = con.execute(
        "SELECT doc_id, lang, text FROM documents"
    ).fetchall()
    langs = sorted({l for _, l, _ in docs})
    cnt = defaultdict(Counter)  # (fold, lang) -> bucket counts
    nd = Counter()  # (fold, lang) -> docs
    feats = []
    for did, lang, txt in docs:
        fold = h("cvfold", did) % CV_FOLDS
        bs = [h("nbfeat", t) % NB_BUCKETS for t in txt.split(" ")]
        feats.append((did, lang, fold, bs))
        cnt[(fold, lang)].update(bs)
        nd[(fold, lang)] += 1
    glob = {l: Counter() for l in langs}
    for (f, l), c in cnt.items():
        glob[l].update(c)
    correct, total = Counter(), Counter()
    for did, lang, fold, bs in feats:
        best = None
        for ml in langs:
            tot_train = sum(glob[ml].values()) - sum(
                cnt[(fold, ml)].values()
            )
            nd_train = {
                l2: sum(
                    nd[(f2, l2)] for f2 in range(CV_FOLDS) if f2 != fold
                )
                for l2 in langs
            }
            pu = round(
                math.log(nd_train[ml] / sum(nd_train.values())) * 1e6
            )
            s = sum(
                round(
                    math.log(
                        (glob[ml][b] - cnt[(fold, ml)][b] + 1)
                        / (tot_train + NB_BUCKETS)
                    )
                    * 1e6
                )
                for b in bs
            )
            key = (-(s + pu), ml)
            if best is None or key < best[0]:
                best = (key, ml)
        total[fold] += 1
        correct[fold] += best[1] == lang
    got = {r.fold: r for r in kfold_nb_cv(spark, sf_small).collect()}
    assert sorted(got) == list(range(CV_FOLDS))
    for f in range(CV_FOLDS):
        assert got[f].n_docs == total[f]
        assert got[f].n_correct == correct[f]
        assert abs(got[f].acc - correct[f] / total[f]) < 1e-6


def test_frequent_triples_matches_python_enumeration(spark, sf_small):
    """Top-10 brand triples must equal a pure-Python enumeration of
    every order's distinct-brand combinations, with exact supports
    and the 3-way lift formula."""
    from collections import Counter, defaultdict
    from itertools import combinations

    from cricket_analytics_nosql_spark.operators.sequences import (
        frequent_triples,
    )

    con = _duck(sf_small)
    con.execute(
        "CREATE VIEW part AS SELECT * FROM"
        f" read_parquet('{os.path.join(sf_small, 'part')}.parquet')"
    )
    baskets = defaultdict(set)
    for ok, br in con.execute(
        "SELECT DISTINCT l_orderkey, p_brand FROM lineitem"
        " JOIN part ON l_partkey = p_partkey"
    ).fetchall():
        baskets[ok].add(br)
    tri, marg = Counter(), Counter()
    for bs in baskets.values():
        for b in bs:
            marg[b] += 1
        for t in combinations(sorted(bs), 3):
            tri[t] += 1
    n = len(baskets)
    top = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = frequent_triples(spark, sf_small).collect()
    assert len(rows) == min(10, len(tri))
    for r, ((a, b, c), s) in zip(rows, top):
        assert (r.a, r.b, r.c, r.support) == (a, b, c, s)
        assert abs(r.support_ratio - s / n) < 1e-6
        lift = s * n * n / (marg[a] * marg[b] * marg[c])
        assert abs(r.lift3 - lift) < 1e-5


def test_huber_mean_matches_python_irls(spark, sf_small):
    """The two-iteration Huber IRLS estimate must equal a
    pure-Python replay with the same 1e4 weight quantization, and
    sit between the median and the mean's outlier pull."""
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.drift import (
        HUBER_C,
        MAD_CONSISTENCY,
        huber_mean_orders,
    )

    con = _duck(sf_small)
    vals = [
        v
        for (v,) in con.execute(
            "SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) // 100"
            " FROM orders"
        ).fetchall()
    ]
    n = len(vals)
    grid = Counter(vals)
    sorted_v = sorted(vals)
    # type-1 pick: first value whose cumulative count >= (n+1)/2
    med = sorted_v[-(-(n + 1) // 2) - 1] if (n + 1) % 2 == 0 else None
    cum = 0
    for v in sorted(grid):
        cum += grid[v]
        if cum >= (n + 1) / 2:
            med = v
            break
    dcum, mad = 0, None
    dgrid = Counter()
    for v, c in grid.items():
        dgrid[abs(v - med)] += c
    for d in sorted(dgrid):
        dcum += dgrid[d]
        if dcum >= (n + 1) / 2:
            mad = d
            break
    k = HUBER_C * MAD_CONSISTENCY * mad
    m = float(med)
    for _ in range(2):
        num = den = 0
        for v, c in grid.items():
            ad = abs(float(v) - m)
            wq = 10000 if ad <= k else round(k * 1e4 / ad)
            num += c * wq * v
            den += c * wq
        m = num / den
    r = huber_mean_orders(spark, sf_small).collect()[0]
    mean = sum(vals) / n
    assert r.n == n and r.median_usd == med and r.mad_usd == mad
    assert abs(r.huber_k - k) < 1e-5
    assert abs(r.mean_usd - mean) < 1e-5
    assert abs(r.huber_mean_usd - m) < 1e-5
    lo, hi = sorted((med, mean))
    assert lo - 1e-6 <= r.huber_mean_usd <= hi + mad


def test_anderson_darling_matches_python_midranks(spark, sf_small):
    """A²akN must equal a pure-Python Scholz-Stephens midrank
    computation (with the same micro-unit quantization) on the same
    dollar-quantized cohorts."""
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.drift import (
        KS_GROUP_A,
        KS_GROUP_B,
        anderson_darling_drift,
    )

    con = _duck(sf_small)
    rows = con.execute(
        "SELECT o_orderpriority, CAST(ROUND(o_totalprice*100) AS BIGINT)"
        f" // 100 FROM orders WHERE o_orderpriority IN"
        f" ('{KS_GROUP_A}', '{KS_GROUP_B}')"
    ).fetchall()
    a = Counter(v for p, v in rows if p == KS_GROUP_A)
    b = Counter(v for p, v in rows if p == KS_GROUP_B)
    na, nb = sum(a.values()), sum(b.values())
    nn = na + nb
    cum_a = cum_b = 0
    sa = sb = 0
    values = sorted(set(a) | set(b))
    for v in values:
        ca, cb = a.get(v, 0), b.get(v, 0)
        w = ca + cb
        cum_a += ca
        cum_b += cb
        b2 = 2 * (cum_a + cum_b) - w
        denom = b2 * (2 * nn - b2) - nn * w
        da = nn * (2 * cum_a - ca) - na * b2
        db = nn * (2 * cum_b - cb) - nb * b2
        sa += round(w * float(da) * float(da) / denom * 1e6)
        sb += round(w * float(db) * float(db) / denom * 1e6)
    a2 = (nn - 1) / nn * (sa / na + sb / nb) / 1e6 / nn
    r = anderson_darling_drift(spark, sf_small).collect()[0]
    assert (r.n_a, r.n_b, r.n_values) == (na, nb, len(values))
    assert abs(r.a2_akn - a2) < 1e-5


def test_eb_shrinkage_matches_python_moments(spark, sf_small):
    """Per-brand shrunk rates must equal the beta-binomial
    method-of-moments fit replayed in Python, and shrinkage must
    pull every raw rate toward the cross-brand mean."""
    from cricket_analytics_nosql_spark.operators.analytics import (
        eb_shrunk_return_rates,
    )

    con = _duck(sf_small)
    con.execute(
        "CREATE VIEW part AS SELECT * FROM"
        f" read_parquet('{os.path.join(sf_small, 'part')}.parquet')"
    )
    br = con.execute(
        "SELECT p_brand, COUNT(*),"
        " SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END)"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " GROUP BY p_brand"
    ).fetchall()
    rq = {brand: round(x * 1e6 / n) for brand, n, x in br}
    k = len(br)
    mu = sum(rq.values()) / k / 1e6
    s2 = sum(v * v for v in rq.values()) / k / 1e12 - mu * mu
    m = mu * (1 - mu) / s2 - 1
    alpha, beta = mu * m, (1 - mu) * m
    got = {r.brand: r for r in eb_shrunk_return_rates(spark, sf_small).collect()}
    assert len(got) == k
    for brand, n, x in br:
        r = got[brand]
        assert (r.n, r.x) == (n, x)
        shrunk = (x + alpha) / (n + alpha + beta)
        assert abs(r.shrunk_rate - shrunk) < 1e-6
        assert abs(r.prior_alpha - alpha) < 1e-4
        assert abs(r.prior_beta - beta) < 1e-4
        raw = x / n
        lo, hi = sorted((raw, mu))
        assert lo - 1e-9 <= shrunk <= hi + 1e-9


def test_dunn_posthoc_matches_python_ranks(spark, sf_small):
    """Every pairwise z must equal a pure-Python Dunn computation on
    the same pooled tie-averaged ranking."""
    from collections import Counter, defaultdict

    from cricket_analytics_nosql_spark.operators.drift import (
        dunn_posthoc_priority,
    )

    con = _duck(sf_small)
    rows = con.execute(
        "SELECT o_orderpriority, CAST(ROUND(o_totalprice*100) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    vals = sorted(v for _, v in rows)
    avg_rank, i = {}, 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        avg_rank[vals[i]] = (i + 1 + j) / 2
        i = j
    by_p = defaultdict(list)
    for p, v in rows:
        by_p[p].append(avg_rank[v])
    n = len(rows)
    tie_cubes = sum(
        t**3 - t for t in Counter(vals).values()
    )
    got = {
        (r.p1, r.p2): r
        for r in dunn_posthoc_priority(spark, sf_small).collect()
    }
    ps = sorted(by_p)
    assert set(got) == {
        (a, b) for i, a in enumerate(ps) for b in ps[i + 1 :]
    }
    import math

    for (p1, p2), r in got.items():
        m1 = sum(by_p[p1]) / len(by_p[p1])
        m2 = sum(by_p[p2]) / len(by_p[p2])
        var = (
            n * (n + 1) / 12 - tie_cubes / (12 * (n - 1))
        ) * (1 / len(by_p[p1]) + 1 / len(by_p[p2]))
        z = (m1 - m2) / math.sqrt(var)
        assert (r.n_1, r.n_2) == (len(by_p[p1]), len(by_p[p2]))
        assert abs(r.mean_rank_1 - m1) < 1e-4
        assert abs(r.z_stat - z) < 1e-5


def test_neyman_allocation_matches_python_and_sums_to_budget(
    spark, sf_small
):
    """Allocations must equal the textbook n_h ∝ N_h·S_h formula
    (with the same centi-unit weight quantization) and the Neyman
    total must hit the budget within per-stratum rounding."""
    import math
    import statistics
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.sampling import (
        NEYMAN_BUDGET,
        neyman_allocation,
    )

    con = _duck(sf_small)
    by_p = defaultdict(list)
    for p, v in con.execute(
        "SELECT o_orderpriority,"
        " CAST(ROUND(o_totalprice*100) AS BIGINT) // 100 FROM orders"
    ).fetchall():
        by_p[p].append(v)
    w = {
        p: round(len(vs) * statistics.stdev(vs) * 100)
        for p, vs in by_p.items()
    }
    w_tot = sum(w.values())
    n_tot = sum(len(vs) for vs in by_p.values())
    got = {r.priority: r for r in neyman_allocation(spark, sf_small).collect()}
    assert sorted(got) == sorted(by_p)
    for p, vs in by_p.items():
        r = got[p]
        assert r.n_h == len(vs)
        assert abs(r.mean_usd - sum(vs) / len(vs)) < 1e-5
        assert abs(r.sd_usd - statistics.stdev(vs)) < 1e-4
        assert r.neyman_n == round(NEYMAN_BUDGET * w[p] / w_tot)
        assert r.proportional_n == round(
            NEYMAN_BUDGET * len(vs) / n_tot
        )
    assert (
        abs(sum(r.neyman_n for r in got.values()) - NEYMAN_BUDGET)
        <= len(by_p)
    )


def test_pacf_matches_python_durbin_levinson(spark, sf_small):
    """ACF and PACF must equal a pure-Python replay (same whole-unit
    product quantization, same Durbin-Levinson closed form)."""
    from cricket_analytics_nosql_spark.operators.drift import (
        pacf_profile,
    )

    con = _duck(sf_small)
    series = [
        x
        for (_, x) in con.execute(
            "SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP))"
            " // 86400000000 AS BIGINT) AS d,"
            " CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT) // 100)"
            " AS BIGINT) FROM orders GROUP BY d ORDER BY d"
        ).fetchall()
    ]
    n = len(series)
    m = sum(series) / n
    den = sum(round((x - m) * (x - m)) for x in series)
    rho = [
        sum(
            round((series[i] - m) * (series[i - k] - m))
            for i in range(k, n)
        )
        / den
        for k in (1, 2, 3)
    ]
    r1, r2, r3 = rho
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 * (1 - p22)
    p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    got = {r.lag: r for r in pacf_profile(spark, sf_small).collect()}
    assert sorted(got) == [1, 2, 3]
    for k, (a_ref, p_ref) in zip(
        (1, 2, 3), zip(rho, (r1, p22, p33))
    ):
        assert abs(got[k].acf - a_ref) < 1e-5
        assert abs(got[k].pacf - p_ref) < 1e-5


def test_periodogram_matches_python_goertzel(spark, sf_small):
    """Per-period power must equal a pure-Python DFT at the same
    candidate frequencies (same whole-unit quantization), shares
    must sum to 1, and exactly one row is the peak."""
    import math

    from cricket_analytics_nosql_spark.operators.drift import (
        PERIODOGRAM_PERIODS,
        periodogram_peaks,
    )

    con = _duck(sf_small)
    days = con.execute(
        "SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP))"
        " // 86400000000 AS BIGINT) AS d,"
        " CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT) // 100)"
        " AS BIGINT) FROM orders GROUP BY d"
    ).fetchall()
    n = len(days)
    m = sum(x for _, x in days) / n
    pw = {}
    for p in PERIODOGRAM_PERIODS:
        a = sum(
            round((x - m) * math.cos(2 * math.pi * (d % p) / p))
            for d, x in days
        )
        b = sum(
            round((x - m) * math.sin(2 * math.pi * (d % p) / p))
            for d, x in days
        )
        pw[p] = a * a + b * b
    tot = sum(pw.values())
    got = {r.period: r for r in periodogram_peaks(spark, sf_small).collect()}
    assert sorted(got) == sorted(PERIODOGRAM_PERIODS)
    peak = max(pw, key=lambda p: (pw[p], -p))
    assert sum(1 for r in got.values() if r.is_peak) == 1
    for p in PERIODOGRAM_PERIODS:
        assert abs(got[p].power - round(pw[p] / n, 2)) < 1e-6
        assert abs(got[p].power_share - pw[p] / tot) < 1e-6
        assert got[p].is_peak == (p == peak)
    assert abs(sum(r.power_share for r in got.values()) - 1.0) < 1e-4


def test_trade_modularity_matches_python(spark, sf_small):
    """Per-nation contributions and global Q must equal a
    pure-Python modularity computation on the same weighted
    nation-pair rollup."""
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.graph import (
        trade_modularity_nations,
    )

    con = _duck(sf_small)
    for t in ("customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{os.path.join(sf_small, t)}.parquet')"
        )
    pairs = Counter()
    for sn, dn, w in con.execute(
        "SELECT c_nationkey, s_nationkey, COUNT(*) FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " GROUP BY 1, 2"
    ).fetchall():
        pairs[(sn, dn)] = w
    names = dict(
        con.execute("SELECT n_nationkey, n_name FROM nation").fetchall()
    )
    ww = sum(pairs.values())
    outs, ins, within = Counter(), Counter(), Counter()
    for (sn, dn), w in pairs.items():
        outs[sn] += w
        ins[dn] += w
        if sn == dn:
            within[sn] += w
    keys = set(outs) | set(ins)
    nums = {
        nk: within.get(nk, 0) * ww - outs.get(nk, 0) * ins.get(nk, 0)
        for nk in keys
    }
    q = sum(nums.values()) / (ww * ww)
    got = {r.nation: r for r in trade_modularity_nations(spark, sf_small).collect()}
    assert set(got) == {names[nk] for nk in keys}
    for nk in keys:
        r = got[names[nk]]
        assert (r.w_within, r.w_out, r.w_in) == (
            within.get(nk, 0),
            outs.get(nk, 0),
            ins.get(nk, 0),
        )
        assert abs(r.contrib - nums[nk] / (ww * ww)) < 1e-6
        assert abs(r.q_modularity - q) < 1e-6


def test_kendalls_w_matches_python_ranks(spark, sf_small):
    """W and χ² must equal a pure-Python tie-corrected concordance
    over the same three brand metrics, and W must be 1 when the
    three rankings are replaced by one."""
    from collections import Counter, defaultdict

    from cricket_analytics_nosql_spark.operators.analytics import (
        kendalls_w_brands,
    )

    con = _duck(sf_small)
    con.execute(
        "CREATE VIEW part AS SELECT * FROM"
        f" read_parquet('{os.path.join(sf_small, 'part')}.parquet')"
    )
    br = con.execute(
        "SELECT p_brand,"
        " SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)"
        " AS BIGINT)), SUM(CAST(l_quantity AS BIGINT)), COUNT(*)"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " GROUP BY p_brand"
    ).fetchall()
    n, k = len(br), 3
    r2_sum = defaultdict(int)
    ties = 0
    for mi in (1, 2, 3):
        vals = [row[mi] for row in br]
        cnt = Counter(vals)
        # doubled tie-averaged rank, descending
        sorted_desc = sorted(cnt, reverse=True)
        min_rank, start = {}, 1
        for v in sorted_desc:
            min_rank[v] = start
            start += cnt[v]
        for row in br:
            v = row[mi]
            r2_sum[row[0]] += 2 * min_rank[v] + cnt[v] - 1
        ties += sum(t**3 - t for t in cnt.values())
    s4 = sum((r2_sum[b] - k * (n + 1)) ** 2 for b, *_ in br)
    w = 3 * s4 / (k * k * (n**3 - n) - k * ties)
    r = kendalls_w_brands(spark, sf_small).collect()[0]
    assert (r.n, r.k) == (n, k)
    assert abs(r.w_concordance - w) < 1e-6
    assert abs(r.chi2_stat - k * (n - 1) * w) < 1e-4
    assert 0.0 <= r.w_concordance <= 1.0 + 1e-9


def test_seasonal_strength_matches_python_replay(spark, sf_small):
    """F_seasonal / F_trend must equal a pure-Python replay of the
    same decomposition and quantization, and both must lie in
    [0, 1]."""
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.drift import (
        seasonal_strength,
    )

    con = _duck(sf_small)
    days = con.execute(
        "SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT),"
        " CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT) // 100)"
        " AS BIGINT) FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ymap = dict(days)
    detr = []
    for d, y in days:
        win = [ymap[d + k] for k in range(-3, 4) if d + k in ymap]
        if len(win) == 7:
            dm = round((y - sum(win) / 7) * 1e6)
            detr.append((d % 7, y, dm))
    by_dow = defaultdict(list)
    for dow, _, dm in detr:
        by_dow[dow].append(dm)
    s_micro = {
        dow: round(sum(v) / len(v)) for dow, v in by_dow.items()
    }
    cells = [
        (dm, dm - s_micro[dow], y * 1000000 - s_micro[dow])
        for dow, y, dm in detr
    ]
    n = len(cells)

    def ss(idx):
        m = sum(c[idx] for c in cells) / n
        return sum(round(((c[idx] - m) / 1e6) ** 2) for c in cells)

    ss_d, ss_r, ss_v = ss(0), ss(1), ss(2)
    f_s = max(0.0, 1 - ss_r / ss_d)
    f_t = max(0.0, 1 - ss_r / ss_v)
    r = seasonal_strength(spark, sf_small).collect()[0]
    assert r.n_days == n
    assert abs(r.var_detrended - round(ss_d / n, 1)) < 0.2
    assert abs(r.f_seasonal - f_s) < 1e-5
    assert abs(r.f_trend - f_t) < 1e-5
    assert 0.0 <= r.f_seasonal <= 1.0 and 0.0 <= r.f_trend <= 1.0


def test_variance_ratio_matches_python_lags(spark, sf_small):
    """VR(q) must equal a pure-Python replay (same drift-adjusted
    whole-unit quantization) at every horizon."""
    from cricket_analytics_nosql_spark.operators.drift import (
        VR_HORIZONS,
        variance_ratio_walk,
    )

    con = _duck(sf_small)
    series = [
        x
        for (_, x) in con.execute(
            "SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP))"
            " // 86400000000 AS BIGINT) AS d,"
            " CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT) // 100)"
            " AS BIGINT) FROM orders GROUP BY d ORDER BY d"
        ).fetchall()
    ]

    def ss(q):
        diffs = [
            series[i] - series[i - q] for i in range(q, len(series))
        ]
        m = sum(diffs) / len(diffs)
        return sum(round((d - m) ** 2) for d in diffs), len(diffs)

    ss1, n1 = ss(1)
    got = {r.q: r for r in variance_ratio_walk(spark, sf_small).collect()}
    assert sorted(got) == list(VR_HORIZONS)
    for q in VR_HORIZONS:
        ssq, nq = ss(q)
        vr = (ssq / nq) / (q * (ss1 / n1))
        assert got[q].n_obs == nq
        assert abs(got[q].variance_ratio - vr) < 1e-5


def test_term_burstiness_matches_python_poisson(spark, sf_small):
    """Top-k terms, observed df and the Poisson-baseline ratio must
    match a pure-Python replay; function-word rows must sit near
    the baseline while content words fall below it."""
    import math
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.text import (
        BURST_TOPK,
        term_burstiness,
    )

    con = _duck(sf_small)
    cf, df = Counter(), Counter()
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    for _, txt in docs:
        toks = [t for t in txt.split(" ") if t]
        cf.update(toks)
        df.update(set(toks))
    d = len(docs)
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:BURST_TOPK]
    rows = term_burstiness(spark, sf_small).collect()
    assert [r.term for r in rows] == [t for t, _ in top]
    for r in rows:
        exp_df = d * (1 - math.exp(-cf[r.term] / d))
        assert (r.cf, r.df) == (cf[r.term], df[r.term])
        assert abs(r.mean_per_doc - cf[r.term] / df[r.term]) < 1e-6
        assert abs(r.poisson_df - round(exp_df, 2)) < 1e-6
        assert abs(r.burst_ratio - df[r.term] / exp_df) < 1e-5
        assert 0.0 < r.burst_ratio <= 1.0 + 1e-9


def test_runs_test_matches_python_sequence(spark, sf_small):
    """Run counts and z must equal a pure-Python scan of the same
    tie-dropped up/down sequence."""
    import math

    from cricket_analytics_nosql_spark.operators.drift import (
        runs_test_updown,
    )

    con = _duck(sf_small)
    series = [
        x
        for (_, x) in con.execute(
            "SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP))"
            " // 86400000000 AS d,"
            " SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))"
            " FROM orders GROUP BY d ORDER BY d"
        ).fetchall()
    ]
    signs = [
        1 if series[i] > series[i - 1] else 0
        for i in range(1, len(series))
        if series[i] != series[i - 1]
    ]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    r = 1 + sum(signs[i] != signs[i - 1] for i in range(1, len(signs)))
    e = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    z = (r - e) / math.sqrt(var)
    row = runs_test_updown(spark, sf_small).collect()[0]
    assert (row.n_up, row.n_down, row.n_runs) == (n1, n2, r)
    assert abs(row.expected_runs - e) < 1e-5
    assert abs(row.z_stat - z) < 1e-5


def test_price_index_matches_python_and_brackets(spark, sf_small):
    """Laspeyres/Paasche must equal a pure-Python unit-value replay
    (same centi-cent quantization) and Fisher must lie between
    them."""
    import math
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.analytics import (
        price_index_years,
    )

    con = _duck(sf_small)
    yp = defaultdict(lambda: [0, 0])
    for y, pk, ep, q in con.execute(
        "SELECT year(l_shipdate), l_partkey,"
        " SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)),"
        " SUM(CAST(l_quantity AS BIGINT)) FROM lineitem GROUP BY 1, 2"
    ).fetchall():
        yp[(y, pk)] = [ep, q]
    years = sorted({y for y, _ in yp})
    got = {(r.y0, r.y1): r for r in price_index_years(spark, sf_small).collect()}
    for y0, y1 in zip(years, years[1:]):
        parts = [
            pk
            for (y, pk) in yp
            if y == y0 and (y1, pk) in yp
        ]
        s00 = sum(yp[(y0, pk)][0] for pk in parts)
        s11 = sum(yp[(y1, pk)][0] for pk in parts)
        s10 = sum(
            round(
                yp[(y1, pk)][0] * yp[(y0, pk)][1] * 100 / yp[(y1, pk)][1]
            )
            for pk in parts
        )
        s01 = sum(
            round(
                yp[(y0, pk)][0] * yp[(y1, pk)][1] * 100 / yp[(y0, pk)][1]
            )
            for pk in parts
        )
        lasp = s10 / (100 * s00)
        paas = 100 * s11 / s01
        r = got[(y0, y1)]
        assert r.n_parts == len(parts)
        assert abs(r.laspeyres - lasp) < 1e-5
        assert abs(r.paasche - paas) < 1e-5
        assert abs(r.fisher - math.sqrt(lasp * paas)) < 1e-5
        lo, hi = sorted((lasp, paas))
        assert lo - 1e-9 <= r.fisher <= hi + 1e-9


def test_abc_xyz_matches_python_classification(spark, sf_small):
    """ABC cut points, demand CV and the class cells must match a
    pure-Python replay, and cumulative shares must be monotone."""
    import statistics
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.analytics import (
        abc_xyz_parts,
    )

    con = _duck(sf_small)
    con.execute(
        "CREATE VIEW part AS SELECT * FROM"
        f" read_parquet('{os.path.join(sf_small, 'part')}.parquet')"
    )
    cells = defaultdict(lambda: defaultdict(int))
    for b, m, rc, q in con.execute(
        "SELECT p_brand, year(l_shipdate)*12 + month(l_shipdate),"
        " SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)),"
        " SUM(CAST(l_quantity AS BIGINT))"
        " FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2"
    ).fetchall():
        cells[b][m] = (rc, q)
    rev = {b: sum(rc for rc, _ in ms.values()) for b, ms in cells.items()}
    tot = sum(rev.values())
    order = sorted(rev, key=lambda b: (-rev[b], b))
    cum = 0
    expected = {}
    for b in order:
        cum += rev[b]
        share = cum / tot
        qs = [q for _, q in cells[b].values()]
        cv = statistics.stdev(qs) / (sum(qs) / len(qs))
        abc = "A" if share <= 0.80 else ("B" if share <= 0.95 else "C")
        xyz = "X" if cv < 0.5 else ("Y" if cv < 1.0 else "Z")
        expected[b] = (share, cv, abc + xyz)
    rows = abc_xyz_parts(spark, sf_small).collect()
    assert [r.brand for r in rows] == order
    prev = 0.0
    for r in rows:
        share, cv, cell = expected[r.brand]
        assert abs(r.cum_share - share) < 1e-6
        assert abs(r.demand_cv - cv) < 1e-5
        assert r.cell == cell and r.abc + r.xyz == cell
        assert r.cum_share >= prev - 1e-9
        prev = r.cum_share


def test_pchart_matches_python_limits(spark, sf_small):
    """Monthly p, the shared centerline, the per-month 3σ limits
    and the flags must match a pure-Python replay."""
    import math

    from cricket_analytics_nosql_spark.operators.analytics import (
        pchart_return_rate,
    )

    con = _duck(sf_small)
    mo = con.execute(
        "SELECT year(l_shipdate)*12 + month(l_shipdate), COUNT(*),"
        " SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END)"
        " FROM lineitem GROUP BY 1 ORDER BY 1"
    ).fetchall()
    tn = sum(n for _, n, _ in mo)
    tr = sum(r for _, _, r in mo)
    pbar = tr / tn
    got = {r.mo: r for r in pchart_return_rate(spark, sf_small).collect()}
    assert sorted(got) == [m for m, _, _ in mo]
    for m, n, ret in mo:
        r = got[m]
        se = math.sqrt(pbar * (1 - pbar) / n)
        ucl, lcl = pbar + 3 * se, max(0.0, pbar - 3 * se)
        assert (r.n_lines, r.n_returned) == (n, ret)
        assert abs(r.p_month - ret / n) < 1e-6
        assert abs(r.p_bar - pbar) < 1e-6
        assert abs(r.ucl - ucl) < 1e-5 and abs(r.lcl - lcl) < 1e-5
        assert r.out_of_control == (ret / n > ucl or ret / n < lcl)


def test_g2_keyness_matches_python_dunning(spark, sf_small):
    """Top-k keyness terms and their G² must match a pure-Python
    Dunning computation on the same two sources."""
    import math
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.text import (
        KEYNESS_SRC_A,
        KEYNESS_SRC_B,
        KEYNESS_TOPK,
        g2_keyness_sources,
    )

    con = _duck(sf_small)
    ca, cb = Counter(), Counter()
    for src, txt in con.execute(
        "SELECT source, text FROM documents WHERE source IN"
        f" ('{KEYNESS_SRC_A}', '{KEYNESS_SRC_B}')"
    ).fetchall():
        (ca if src == KEYNESS_SRC_A else cb).update(
            t for t in txt.split(" ") if t
        )
    na, nb = sum(ca.values()), sum(cb.values())
    scores = {}
    for t in set(ca) | set(cb):
        a, b = ca.get(t, 0), cb.get(t, 0)
        ea = na * (a + b) / (na + nb)
        eb = nb * (a + b) / (na + nb)
        g2 = 2 * (
            (a * math.log(a / ea) if a else 0.0)
            + (b * math.log(b / eb) if b else 0.0)
        )
        scores[t] = (g2, a, b)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[
        :KEYNESS_TOPK
    ]
    rows = g2_keyness_sources(spark, sf_small).collect()
    assert [r.term for r in rows] == [t for t, _ in top]
    for r, (t, (g2, a, b)) in zip(rows, top):
        assert (r.a, r.b) == (a, b)
        assert abs(r.g2 - g2) < 1e-4
        expect_side = (
            KEYNESS_SRC_A if a / na >= b / nb else KEYNESS_SRC_B
        )
        assert r.overused_in == expect_side


def test_moods_median_matches_python_table(spark, sf_small):
    """The 2×k table and χ² must match a pure-Python replay with
    the same global-median pick and 1e-6 cell quantization."""
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.drift import (
        moods_median_test,
    )

    con = _duck(sf_small)
    rows = con.execute(
        "SELECT o_orderpriority, CAST(ROUND(o_totalprice*100) AS BIGINT)"
        " FROM orders"
    ).fetchall()
    vals = sorted(v for _, v in rows)
    n = len(vals)
    cum, med = 0, None
    from collections import Counter

    grid = Counter(vals)
    for v in sorted(grid):
        cum += grid[v]
        if cum >= (n + 1) / 2:
            med = v
            break
    by_p = defaultdict(lambda: [0, 0])  # [n_g, above]
    for p, v in rows:
        by_p[p][0] += 1
        by_p[p][1] += v > med
    tot_above = sum(a for _, a in by_p.values())
    chi2_e6 = 0
    for p, (ng, a) in by_p.items():
        ea = ng * tot_above / n
        eb = ng * (n - tot_above) / n
        chi2_e6 += round(
            ((a - ea) ** 2 / ea + ((ng - a) - eb) ** 2 / eb) * 1e6
        )
    got = {r.p: r for r in moods_median_test(spark, sf_small).collect()}
    assert sorted(got) == sorted(by_p)
    for p, (ng, a) in by_p.items():
        r = got[p]
        assert (r.n_g, r.above) == (ng, a)
        assert abs(r.expected_above - ng * tot_above / n) < 1e-5
        assert abs(r.chi2_stat - chi2_e6 / 1e6) < 1e-5


def test_taylors_law_matches_python_ols(spark, sf_small):
    """Per-type moments and the fitted power-law slope must equal a
    pure-Python replay with the same micro-nat quantization."""
    from collections import Counter

    from cricket_analytics_nosql_spark.operators.drift import (
        taylors_law_events,
    )

    import math

    con = _duck(sf_small)
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{os.path.join(sf_small, 'events')}.parquet')"
    )
    cells = Counter()
    for et, d in con.execute(
        "SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP))"
        " // 86400000000 FROM events"
    ).fetchall():
        cells[(et, d)] += 1
    types = sorted({et for et, _ in cells})
    pts = []
    stats = {}
    for et in types:
        cs = [c for (t, _), c in cells.items() if t == et]
        n = len(cs)
        mean = sum(cs) / n
        var = (sum(c * c for c in cs) - sum(cs) ** 2 / n) / (n - 1)
        stats[et] = (n, mean, var)
        pts.append(
            (round(math.log(mean) * 1e6), round(math.log(var) * 1e6))
        )
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    a = (sy / k - b * sx / k) / 1e6
    got = {r.event_type: r for r in taylors_law_events(spark, sf_small).collect()}
    assert sorted(got) == types
    for et in types:
        n, mean, var = stats[et]
        r = got[et]
        assert r.n_days == n
        assert abs(r.mean_daily - mean) < 1e-5
        assert abs(r.var_daily - var) < 1e-4
        assert abs(r.taylor_b - b) < 1e-6
        assert abs(r.ln_a - a) < 1e-6


def test_vocab_accumulation_matches_python_first_source(spark, sf_small):
    """New-term attribution and the cumulative curve must match a
    pure-Python first-source scan; the last row must cover the full
    vocabulary."""
    from collections import defaultdict

    from cricket_analytics_nosql_spark.operators.text import (
        vocab_accumulation_sources,
    )

    con = _duck(sf_small)
    first = {}
    for src, txt in sorted(
        con.execute("SELECT source, text FROM documents").fetchall()
    ):
        for t in txt.split(" "):
            if t and (t not in first or src < first[t]):
                first[t] = src
    gained = defaultdict(int)
    for t, s in first.items():
        gained[s] += 1
    rows = vocab_accumulation_sources(spark, sf_small).collect()
    assert [r.source for r in rows] == sorted(gained)
    cum = 0
    for r in rows:
        assert r.new_terms == gained[r.source]
        cum += gained[r.source]
        assert r.cum_vocab == cum
        assert abs(r.coverage_share - cum / len(first)) < 1e-6
    assert rows[-1].cum_vocab == len(first)
    assert abs(rows[-1].coverage_share - 1.0) < 1e-9
