#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <outDir> <sfDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares: schema (column names sorted), row count,
and values (columns sorted by name, exact equality).

ASSUMPTION (inferred from round-1 driver evidence, not from the driver's
code): the driver's hash is typed by dtype KIND, not width — int32 vs
int64 passed (window_rank et al.) while DOUBLE vs BIGINT and HUGEINT
failed on equal values. This mimic treats {int, uint} as one kind and
everything else as strict. If the real driver also distinguishes signed
vs unsigned, or bool vs int, this mimic is too lenient there. Whenever a
query flips between local PASS and driver FAIL, re-validate this gate
against the driver's CORRECTNESS_r*.json before trusting either side.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            print(f"rows {name}: rows-only check, {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}"); n_fail += 1; continue
        g, e = got[gcols].reset_index(drop=True), exp[ecols].reset_index(drop=True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        bad = None
        for c in gcols:
            gv, ev = g[c], e[c]
            # the driver's hash is TYPED by KIND, not width: int32 vs int64
            # passes (r01 evidence: window_rank et al.), but HUGEINT→object
            # and DOUBLE vs BIGINT fail even when values are equal
            gk = getattr(gv.dtype, "kind", "O")
            ek = getattr(ev.dtype, "kind", "O")
            if gk != ek and not ({gk, ek} <= {"i", "u"}):
                bad = (c, -1, f"<dtype kind {gk}>", f"<dtype kind {ek}>",
                       str(gv.dtype), str(ev.dtype))
                break
            try:
                eq = (gv == ev) | (gv.isna() & ev.isna())
            except Exception:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad = (c, i, gv.iloc[i], ev.iloc[i],
                       str(gv.dtype), str(ev.dtype))
                break
        if bad:
            c, i, gvv, evv, gd, ed = bad
            print(f"FAIL {name}: col {c} row {i}: spark={gvv!r}({gd}) duckdb={evv!r}({ed})")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
