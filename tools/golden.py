#!/usr/bin/env python3
"""Third-implementation goldens (VERDICT r7 item 2) — dev tool.

The DuckDB oracles deliberately replay the Spark formulation (shared
fixed-point constants, shared closed forms), so a shared-formula bug is
invisible to the hash gate by construction. This script re-derives the
statistics family from TEXTBOOK formulas in numpy/pandas — no fixed
point, no shared expression strings — and compares against the parquet
written by `graft.Verify`, tolerance-based (not hash).

Usage:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/gold"
    python3 tools/golden.py /root/testdata/sf0.001 /tmp/gold
"""
import sys
import numpy as np
import pandas as pd
import duckdb

FAIL = []


def check(name, cond, msg):
    tag = "PASS" if cond else "FAIL"
    print(f"{tag} {name}: {msg}")
    if not cond:
        FAIL.append(name)


def load(out, key):
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{out}/{key}/*.parquet')").df()


def events_cv(con):
    """click/view event values, plus UTC day index (data plumbing only —
    the statistics below are pure numpy)."""
    return con.execute("""
        SELECT event_type AS g, value AS x,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
                 AS day
        FROM events""").df()


def golden_ks(con, out):
    df = events_cv(con)
    a = np.sort(df.loc[df.g == "click", "x"].to_numpy())
    b = np.sort(df.loc[df.g == "view", "x"].to_numpy())
    grid = np.union1d(a, b)
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d_ref = np.max(np.abs(fa - fb))
    got = load(out, "agg_ks_test")
    check("agg_ks_test", abs(got.ks_d[0] - d_ref) < 1e-6,
          f"D spark={got.ks_d[0]:.6f} numpy={d_ref:.6f}")


def golden_mannwhitney(con, out):
    df = events_cv(con)
    df = df[df.g.isin(["click", "view"])]
    ranks = df.x.rank(method="average")  # tie-averaged ranks
    n1 = int((df.g == "click").sum())
    n2 = int((df.g == "view").sum())
    r1 = float(ranks[df.g == "click"].sum())
    u1_ref = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    _, t = np.unique(df.x.to_numpy(), return_counts=True)
    tie = float(np.sum(t.astype(np.float64) ** 3 - t))
    var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z_ref = (u1_ref - n1 * n2 / 2.0) / np.sqrt(var)
    got = load(out, "agg_mannwhitney")
    check("agg_mannwhitney_u", abs(got.u1[0] - u1_ref) < 0.51,
          f"U1 spark={got.u1[0]:.1f} numpy={u1_ref:.1f}")
    check("agg_mannwhitney_z", abs(got.z[0] - z_ref) < 1e-3,
          f"z spark={got.z[0]:.4f} numpy={z_ref:.4f}")


def golden_km(con, out):
    ev = con.execute("""
        SELECT user_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
                 AS day
        FROM events""").df()
    hz = ev.day.max()
    per = ev.groupby("user_id").day.agg(["min", "max"])
    t = (per["max"] - per["min"]).to_numpy()
    cens = (per["max"] >= hz).to_numpy()
    km = {}
    surv = 1.0
    for ti in np.unique(t):
        at_risk = int(np.sum(t >= ti))
        d = int(np.sum((t == ti) & ~cens))
        if d > 0:
            surv *= 1.0 - d / at_risk
        km[int(ti)] = surv
    got = load(out, "agg_survival_km").sort_values("t")
    bad = []
    for _, row in got.iterrows():
        ref = km[int(row.t)]
        if abs(row.km - ref) > 1e-3:
            bad.append((int(row.t), row.km, ref))
    check("agg_survival_km", not bad,
          f"{len(got)} curve points, worst mismatches: {bad[:3] or 'none'}")


def daily_series(con):
    return con.execute("""
        SELECT event_type,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
                 AS day,
               CAST(round(sum(CAST(value AS DECIMAL(38,4))), 4) AS DOUBLE)
                 AS y
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""").df()


def golden_theil_sen(con, out):
    daily = daily_series(con)
    got = load(out, "win_theil_sen").set_index("event_type")
    bad = []
    for et, grp in daily.groupby("event_type"):
        d = grp.day.to_numpy(dtype=np.float64)
        y = grp.y.to_numpy()
        i, j = np.triu_indices(len(d), k=1)
        slopes = (y[j] - y[i]) / (d[j] - d[i])
        m = float(np.median(slopes))
        b0 = float(np.median(y - m * d))
        row = got.loc[et]
        if abs(row.slope - m) > 1e-4 or abs(row.intercept - b0) > 1e-2:
            bad.append((et, row.slope, m, row.intercept, b0))
    check("win_theil_sen", not bad,
          f"{len(got)} series, mismatches: {bad or 'none'}")


def golden_mann_kendall(con, out):
    daily = daily_series(con)
    got = load(out, "win_mann_kendall").set_index("event_type")
    bad = []
    for et, grp in daily.groupby("event_type"):
        y = grp.sort_values("day").y.to_numpy()
        n = len(y)
        i, j = np.triu_indices(n, k=1)
        s_ref = int(np.sum(np.sign(y[j] - y[i])))
        _, t = np.unique(y, return_counts=True)
        var = (n * (n - 1) * (2 * n + 5)
               - float(np.sum(t * (t - 1) * (2 * t + 5)))) / 18.0
        z_ref = (s_ref - np.sign(s_ref)) / np.sqrt(var)
        row = got.loc[et]
        if row.s_stat != s_ref or abs(row.z - z_ref) > 1e-3:
            bad.append((et, int(row.s_stat), s_ref, row.z, z_ref))
    check("win_mann_kendall", not bad,
          f"{len(got)} series, mismatches: {bad or 'none'}")


def golden_cuped(con, out):
    ev = con.execute("""
        SELECT user_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400
                 AS day,
               value
        FROM events""").df()
    split = ev.day.min() + 15
    per = ev.groupby("user_id").apply(
        lambda g: pd.Series({
            "pre": round(g.loc[g.day < split, "value"].sum(), 4),
            "post": round(g.loc[g.day >= split, "value"].sum(), 4)}),
        include_groups=False)
    x, y = per.pre.to_numpy(), per.post.to_numpy()
    vx = x.var()        # population variance, matching the closed form
    vy = y.var()
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    theta = cov / vx
    var_adj = vy - cov * cov / vx
    red = 100.0 * (cov * cov / vx) / vy
    got = load(out, "agg_cuped").iloc[0]
    ok = (abs(got.theta - theta) < 1e-4
          and abs(got.var_post - vy) / vy < 1e-6
          and abs(got.var_adjusted - var_adj) / vy < 1e-6
          and abs(got.var_reduction_pct - red) < 1e-3)
    check("agg_cuped", ok,
          f"theta spark={got.theta:.6f} numpy={theta:.6f}, "
          f"reduction spark={got.var_reduction_pct:.4f} numpy={red:.4f}")


def golden_power(con, out):
    x = con.execute(
        "SELECT CAST(value AS DOUBLE) FROM events"
        " WHERE event_type = 'click'").df().iloc[:, 0].to_numpy()
    mu, var = x.mean(), x.var()
    mde = 0.05 * mu
    n_ref = int(np.ceil(2 * var * (1.959964 + 0.841621) ** 2 / mde ** 2))
    got = load(out, "agg_power_analysis").iloc[0]
    ok = (abs(got.mu - mu) < 1e-3 and abs(got.sigma2 - var) / var < 1e-5
          and abs(int(got.n_per_arm) - n_ref) <= 1)
    check("agg_power_analysis", ok,
          f"n/arm spark={int(got.n_per_arm)} numpy={n_ref}, "
          f"sigma2 spark={got.sigma2:.2f} numpy={var:.2f}")


def golden_pca(con, out):
    X = np.array(con.execute(
        "SELECT embedding FROM embeddings ORDER BY vec_id").df()
        .embedding.tolist(), dtype=np.float64)
    mu_ref = X.mean(axis=0)
    C = np.cov(X, rowvar=False, bias=True)  # population covariance
    evals, evecs = np.linalg.eigh(C)
    lam1, top = evals[-1], evecs[:, -1]
    got = load(out, "sim_pca_power").sort_values("pos")
    mu = got.mu.to_numpy()
    v = got.loading.to_numpy()
    eig = float(got.eigval.iloc[0])
    check("pca_mean", np.max(np.abs(mu - mu_ref)) < 1e-4,
          f"max |mu diff| = {np.max(np.abs(mu - mu_ref)):.2e}")
    check("pca_unit_norm", abs(np.linalg.norm(v) - 1.0) < 1e-4,
          f"|v| = {np.linalg.norm(v):.6f}")
    # the reported eigval must be the Rayleigh quotient of the reported
    # vector under the TRUE covariance — validates the whole covariance
    # pass and contraction against an independent matrix
    rq = float(v @ C @ v)
    check("pca_rayleigh", abs(eig - rq) < 1e-3,
          f"eigval spark={eig:.6f} vᵀCv numpy={rq:.6f}")
    # 5 power rounds on a flat spectrum won't reach λ₁ exactly; the
    # contract is the OperatorSpec floor (≥0.8·λ₁) and never above λ₁
    check("pca_eig_bounds", 0.8 * lam1 - 1e-6 <= eig <= lam1 + 1e-4,
          f"eigval={eig:.6f} vs λ₁={lam1:.6f} "
          f"(cos to true top: {abs(v @ top):.3f})")


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["events", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')")
    golden_ks(con, out)
    golden_mannwhitney(con, out)
    golden_km(con, out)
    golden_theil_sen(con, out)
    golden_mann_kendall(con, out)
    golden_cuped(con, out)
    golden_power(con, out)
    golden_pca(con, out)
    print(f"\n{'ALL GREEN' if not FAIL else 'FAILURES: ' + str(FAIL)}")
    sys.exit(1 if FAIL else 0)


if __name__ == "__main__":
    main()
