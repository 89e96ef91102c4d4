#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and diff exactly (columns sorted
by name, rows sorted, values compared STRICTLY — type identity matters,
because the driver hashes value representations, so Decimal(5.00) vs
5.0 vs 5 are three different hashes even though Python says they are
numerically equal).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def key(v):
    """Strict canonical key: (type-name, value-repr). Two values match
    only if both the Python type and the exact repr agree."""
    if v is None:
        return ("none", "")
    t = type(v).__name__
    if isinstance(v, float):
        if math.isnan(v):
            return (t, "NaN")
        return (t, repr(v))
    return (t, str(v))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(key(r[i]) for i in order))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            got_rel = con.sql(f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            got_cols = [c.lower() for c in got_rel.columns]
            got_types = [str(t) for t in got_rel.types]
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            o_rel = con.sql(sql)
            o_cols = [c.lower() for c in o_rel.columns]
            o_types = [str(t) for t in o_rel.types]
            orc = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs oracle {sorted(o_cols)}")
            n_fail += 1
            continue
        g_t = dict(zip(got_cols, got_types))
        o_t = dict(zip(o_cols, o_types))
        ty_diff = {c: (g_t[c], o_t[c]) for c in g_t if g_t[c] != o_t[c]}
        if ty_diff:
            print(f"FAIL {name}: dtype mismatch {ty_diff}")
            n_fail += 1
            continue
        g = canon(got, got_cols)
        o = canon(orc, o_cols)
        if len(g) != len(o):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(o)}")
            print(f"  spark[:3]={g[:3]}\n  oracle[:3]={o[:3]}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, o)) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g)} differing rows; first 3:")
            for i, a, b in bad[:3]:
                print(f"  row {i}:\n    spark={a}\n    oracle={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
