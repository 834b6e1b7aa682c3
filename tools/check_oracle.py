#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate.

Runs every oracle SQL from Verify's oracle_sql.json in DuckDB against the
same parquet tables and compares with the Spark-produced parquet, the way
the driver does: columns sorted by name, rows sorted, values hashed.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json OUT]

With --json OUT, a machine-readable record in the driver's schema —
{query: {rows_match, schema_match, hash_match, err}} — is written to OUT
(the CORRECTNESS_SELF_r{N}.json protocol, BASELINE.md: every round commits
its own artifact at final HEAD so the repo's correctness record never
depends on the driver's artifact pipeline surviving the host).

Each oracle runs in its OWN subprocess: DuckDB never returns a closed
connection's memory to the OS (round-11 measurement: ~40 GiB RSS held
after ~90 small oracles in one process), so in-process the heavy
index-replay oracles (q102/q120/q127 at sf1, >44 GiB working set each)
OOM or not depending on how many queries ran BEFORE them — order-
dependent flakiness. Process-per-oracle makes every query see the
whole machine. `--single <name>` is the child mode (also handy for
targeted reruns); the child prints its human PASS/FAIL line plus a
final `RESULT_JSON {...}` line the parent parses.
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


def check_one(sf_dir: str, out_dir: str, name: str, sql: str) -> dict:
    """Run one oracle + compare; prints PASS/FAIL/WARN, returns the record
    {rows_match, schema_match, hash_match, err} (driver schema)."""
    rec = {"rows_match": False, "schema_match": False, "hash_match": False, "err": None}
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
        rec["err"] = f"spark output unreadable: {e}"
        print(f"FAIL {name}: {rec['err']}")
        return rec
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        rec["err"] = f"oracle sql error: {e}"
        print(f"FAIL {name}: {rec['err']}")
        return rec
    finally:
        con.close()
    g, w = canon(got), canon(want)
    rec["rows_match"] = len(g) == len(w)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
        return rec
    schema_mismatch = [
        (c, str(g[c].dtype), str(w[c].dtype))
        for c in g.columns
        if str(g[c].dtype) != str(w[c].dtype)
    ]
    rec["schema_match"] = not schema_mismatch
    if not rec["rows_match"]:
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        return rec
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
        return rec
    rec["hash_match"] = True
    if schema_mismatch:
        print(f"WARN {name}: values equal but dtypes differ: {schema_mismatch}")
        return rec
    print(f"PASS {name} ({len(g)} rows)")
    return rec


def passed(rec: dict) -> bool:
    # the gate: rows + values; a dtype-only divergence WARNs but passes
    # (recorded honestly as schema_match=false in the JSON artifact)
    return rec["rows_match"] and rec["hash_match"]


def main(sf_dir: str, out_dir: str, json_out: str | None) -> int:
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    records = {}
    for name in sorted(oracles):
        # process-per-oracle: the child prints the human line plus a
        # RESULT_JSON trailer; its memory dies with it
        proc = subprocess.run(
            [sys.executable, __file__, sf_dir, out_dir, "--single", name],
            capture_output=True, text=True,
        )
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "err": f"child died: rc={proc.returncode}"}
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT_JSON "):
                rec = json.loads(line[len("RESULT_JSON "):])
            else:
                print(line)
        if proc.stderr.strip():
            print(proc.stderr, file=sys.stderr, end="")
        records[name] = rec
        if passed(rec):
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail of {len(oracles)}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = list(sys.argv[1:])
    if len(args) == 4 and args[2] == "--single":
        _oracles = json.load(open(f"{args[1]}/oracle_sql.json"))
        _rec = check_one(args[0], args[1], args[3], _oracles[args[3]])
        print("RESULT_JSON " + json.dumps(_rec))
        sys.exit(0 if passed(_rec) else 1)
    _json_out = None
    if "--json" in args:
        i = args.index("--json")
        _json_out = args[i + 1]
        del args[i:i + 2]
    sys.exit(main(args[0], args[1], _json_out))
