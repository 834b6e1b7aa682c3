#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate.

Runs every oracle SQL from Verify's oracle_sql.json in DuckDB against the
same parquet tables and compares with the Spark-produced parquet, the way
the driver does: columns sorted by name, rows sorted, values hashed.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        # fresh connection per oracle: one long-lived DuckDB process
        # accumulates allocator state across 100+ queries and the heavy
        # index-replay oracles (q102 at sf1) then OOM spuriously
        con = duckdb.connect()
        # an in-memory connection has NO temp directory, so the big
        # index-replay oracles (q102/q120 full IVFADC builds at sf1)
        # cannot spill and die on a tiny allocation the moment 32
        # threads' hash tables brush the limit; give them a spill path
        # and keep the limit at the (full-RAM) default — q102's pinned
        # working set alone exceeds 44 GiB, so do NOT lower it
        con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            con.close()
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            con.close()
            continue
        con.close()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        schema_mismatch = [
            (c, str(g[c].dtype), str(w[c].dtype))
            for c in g.columns
            if str(g[c].dtype) != str(w[c].dtype)
        ]
        bad_cols = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                bad_cols.append((c, idx, a[idx], b[idx], int((~eq).sum())))
        if bad_cols:
            print(f"FAIL {name}: value mismatches:")
            for c, idx, av, bv, n in bad_cols[:4]:
                print(f"    col {c}: {n} diffs, first at row {idx}: spark={av!r} oracle={bv!r}")
            n_fail += 1
        elif schema_mismatch:
            print(f"WARN {name}: values equal but dtypes differ: {schema_mismatch}")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail of {len(oracles)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
