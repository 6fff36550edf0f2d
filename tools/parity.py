#!/usr/bin/env python3
"""Row-level parity between two graft.Verify output dirs (e.g. a
cluster run vs its local[32] twin): for each key, count rows and diff
EXCEPT ALL in BOTH directions through DuckDB — multiset equality, not
just matching counts. Exit 0 iff every key matches.

Usage: python3 tools/parity.py <dirA> <dirB> <key> [key...]
       python3 tools/parity.py --selftest   (verifies a mismatch FAILS)
"""
import sys


def compare(con, a, b, k):
    pa, pb = f"{a}/{k}/*.parquet", f"{b}/{k}/*.parquet"
    na = con.sql(f"SELECT count(*) FROM read_parquet('{pa}')").fetchone()[0]
    nb = con.sql(f"SELECT count(*) FROM read_parquet('{pb}')").fetchone()[0]
    d1 = con.sql(f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pa}')"
                 f" EXCEPT ALL SELECT * FROM read_parquet('{pb}'))").fetchone()[0]
    d2 = con.sql(f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pb}')"
                 f" EXCEPT ALL SELECT * FROM read_parquet('{pa}'))").fetchone()[0]
    ok = na == nb and d1 == 0 and d2 == 0
    print(f"{k}: a={na} b={nb} diff={d1}+{d2} -> "
          f"{'MATCH' if ok else 'MISMATCH'}")
    return ok


def selftest():
    # identical data must MATCH; one mutated row must MISMATCH — the
    # negative control that proves EXCEPT ALL actually bites.
    import duckdb, os, tempfile
    con = duckdb.connect()
    root = tempfile.mkdtemp(prefix="graft_parity_st_")
    for d, mut in (("a", ""), ("b", ""), ("c", "WHERE i <> 3 UNION ALL SELECT 99, 'x'")):
        os.makedirs(f"{root}/{d}/k")
        con.sql(f"COPY (SELECT * FROM (SELECT unnest(range(10)) i, 'v' s) {mut}) "
                f"TO '{root}/{d}/k/part.parquet' (FORMAT parquet)")
    same = compare(con, f"{root}/a", f"{root}/b", "k")
    diff = compare(con, f"{root}/a", f"{root}/c", "k")
    ok = same and not diff
    print(f"selftest: {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(2)
    import duckdb
    con = duckdb.connect()
    a, b, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    fails = sum(0 if compare(con, a, b, k) else 1 for k in keys)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
