#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate.

Runs every oracle SQL from Verify's oracle_sql.json in DuckDB against the
same parquet tables and compares with the Spark-produced parquet, the way
the driver does: columns sorted by name, rows sorted, values hashed.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Each oracle runs in its OWN subprocess: DuckDB never returns a closed
connection's memory to the OS (round-11 measurement: ~40 GiB RSS held
after ~90 small oracles in one process), so in-process the heavy
index-replay oracles (q102/q120/q127 at sf1, >44 GiB working set each)
OOM or not depending on how many queries ran BEFORE them — order-
dependent flakiness. Process-per-oracle makes every query see the
whole machine. `--single <name>` is the child mode (also handy for
targeted reruns).
"""
import json
import subprocess
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


def check_one(sf_dir: str, out_dir: str, name: str, sql: str) -> bool:
    """Run one oracle + compare; prints PASS/FAIL/WARN, returns pass."""
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
        return False
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        return False
    finally:
        con.close()
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
        return False
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        return False
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
        return False
    if schema_mismatch:
        print(f"WARN {name}: values equal but dtypes differ: {schema_mismatch}")
        return True
    print(f"PASS {name} ({len(g)} rows)")
    return True


def main(sf_dir: str, out_dir: str) -> int:
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        # process-per-oracle: the child prints the PASS/FAIL line; its
        # exit code carries the verdict; its memory dies with it
        rc = subprocess.run(
            [sys.executable, __file__, sf_dir, out_dir, "--single", name]
        ).returncode
        if rc == 0:
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail of {len(oracles)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if len(sys.argv) == 5 and sys.argv[3] == "--single":
        _oracles = json.load(open(f"{sys.argv[2]}/oracle_sql.json"))
        _name = sys.argv[4]
        sys.exit(0 if check_one(sys.argv[1], sys.argv[2], _name, _oracles[_name]) else 1)
    sys.exit(main(sys.argv[1], sys.argv[2]))
