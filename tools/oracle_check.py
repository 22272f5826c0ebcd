#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
columns by name, canonicalize values, and compare. Dev tool only — not part
of the Scala build.

Usage: python3 tools/oracle_check.py <sfdir> <verify_outdir>
"""
import sys, json, glob, math, datetime
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # sort rows by all columns for order-insensitive compare fallback
    return df


def cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return repr(v)
        return f"{v:.10g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    # pandas reads DuckDB DATE as midnight datetime64 but parquet date32 as
    # datetime.date — same logical value, align the rendering
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return v.isoformat() + "T00:00:00"
    if isinstance(v, (list,)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)


def frame_rows(df: pd.DataFrame):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
        except Exception as e:
            print(f"[warn] view {t}: {e}")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    fails = []
    for name, sql in sorted(oracles.items()):
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1; fails.append(name); continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result")
            n_fail += 1; fails.append(name); continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        o, s = canon(odf), canon(sdf)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            n_fail += 1; fails.append(name); continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1; fails.append(name); continue
        orows, srows = frame_rows(o), frame_rows(s)
        if orows == srows:
            n_pass += 1
        elif sorted(orows) == sorted(srows):
            # same multiset, different order — driver hashes sorted values,
            # so this would still pass, but flag it
            print(f"PASS* {name}: rows equal only after sorting (ordering differs)")
            n_pass += 1
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs:")
            for i, a, b in diffs:
                print(f"   row {i}: oracle={a}")
                print(f"   row {i}:  spark={b}")
            n_fail += 1; fails.append(name)
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracles)}")
    if fails:
        print("failed:", " ".join(fails))
        sys.exit(1)


if __name__ == "__main__":
    main()
