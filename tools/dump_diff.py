#!/usr/bin/env python3
"""Compare two graft.Verify dumps query-by-query (r13, the sf1-equivalent
determinism gate): for each query directory present in both dumps, load the
parquet, sort columns by name and rows by value, and compare row count,
schema, and an order-independent value hash. Exit 0 iff every query matches.

Usage: python3 tools/dump_diff.py <dumpA> <dumpB> [--skip name1,name2]
"""
import json
import os
import sys

import duckdb


def qhash(con, path: str):
    """Row count, sorted column list, and an order-independent value hash.

    The hash is computed INSIDE DuckDB (sum of per-row 64-bit hashes over the
    name-sorted column struct, widened to HUGEINT so the sum cannot overflow)
    — the sf1-equivalent dumps include ~1e9-row outputs that must never be
    fetched into Python row by row.
    """
    rel = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')")
    cols = sorted(rel.columns)
    sel = ", ".join(f'"{c}" := "{c}"' for c in cols)
    n, s = con.sql(
        f"SELECT count(*), sum(hash(struct_pack({sel}))::HUGEINT) "
        f"FROM read_parquet('{path}/*.parquet')"
    ).fetchone()
    return n, cols, str(s)


def main():
    a, b = sys.argv[1], sys.argv[2]
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))
    names = sorted(
        n for n in os.listdir(a)
        if os.path.isdir(os.path.join(a, n)) and os.path.isdir(os.path.join(b, n))
        and n not in skip)
    con = duckdb.connect()
    bad = []
    for n in names:
        try:
            ra = qhash(con, os.path.join(a, n))
            rb = qhash(con, os.path.join(b, n))
            if ra != rb:
                why = ("rows" if ra[0] != rb[0] else
                       "schema" if ra[1] != rb[1] else "hash")
                bad.append((n, why, ra[0], rb[0]))
                print(f"  [DIFF:{why}] {n} ({ra[0]} vs {rb[0]} rows)")
            else:
                print(f"  [same] {n} ({ra[0]} rows)")
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append((n, f"error: {e}", -1, -1))
            print(f"  [ERR] {n}: {e}")
    print(f"{len(names) - len(bad)}/{len(names)} identical")
    if bad:
        print(json.dumps([{"query": n, "why": w} for n, w, *_ in bad], indent=1))
        sys.exit(1)


if __name__ == "__main__":
    main()
