#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (self-check only; the
engine itself is pure Scala/Spark). Usage:
    python3 tools/check.py <verify-outdir> <sf-dir> [query...]
Reads <outdir>/<name>/ parquet (Spark result) + <outdir>/oracle_sql.json,
runs each oracle against DuckDB views over <sf-dir>/*.parquet, and
compares: column names (sorted), row count, and exact sorted values.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# Registered queries that are ALLOWED to have no DuckDB oracle, each with
# the reason and its exact oracle-backed companions. Any other output dir
# without an oracle entry is a red row (a query must never silently skip
# the gate).
SANCTIONED = {
    "t_profile": "engine-opaque HLL++; exact companions "
                 "t_profile_exact/t_hll_counts",
}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total order across dtypes
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return df.loc[order].reset_index(drop=True)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    # output dirs with no oracle entry: sanctioned → counted separately,
    # anything else → red (no query may silently skip the gate)
    sanctioned = []
    for d in sorted(os.listdir(outdir)):
        pdir = os.path.join(outdir, d)
        if not os.path.isdir(pdir) or d in oracle or (only and d not in only):
            continue
        if d in SANCTIONED:
            sanctioned.append(d)
        else:
            results[d] = "NO ORACLE (not in the sanctioned-exceptions list)"
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            results[name] = "MISSING spark output"
            continue
        got = pq.read_table(pdir).to_pandas()
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        if sorted(got.columns) != sorted(want.columns):
            results[name] = f"COLS got={sorted(got.columns)} want={sorted(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWS got={len(got)} want={len(want)}"
            continue
        g, w = canon(got), canon(want)
        bad = None
        for c in g.columns:
            gv, wv = g[c], w[c]
            try:
                eq = (gv.astype(str) == wv.astype(str)).all()
            except Exception:
                eq = False
            if not eq:
                i = (gv.astype(str) != wv.astype(str)).idxmax()
                bad = f"VAL col={c} row{i}: got={gv[i]!r} want={wv[i]!r}"
                break
        results[name] = bad or "OK"
    nok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + k + ("" if v == "OK" else "  " + v))
    for k in sanctioned:
        print(f"SANCTIONED {k}  ({SANCTIONED[k]})")
    tail = f" + {len(sanctioned)} sanctioned" if sanctioned else ""
    print(f"{nok}/{len(results)} OK{tail}")
    sys.exit(0 if nok == len(results) else 1)

if __name__ == "__main__":
    main()
