#!/usr/bin/env python3
"""Dev-side sf1 soak-data generator (driver tables are read-only; sf1 is not shipped).

Builds a deterministic 10x scale-up of /root/testdata/sf0.1 by unioning ten
key-offset shards: every entity key (custkey, orderkey, partkey, suppkey,
event_id, user_id, doc_id, vec_id) in shard i is offset by i*STRIDE, so all
foreign-key joins land within the shard and the result is a valid corpus 10x
the rows. Non-key payloads (text, embeddings, timestamps) repeat across
shards — realistic for a web corpus (exact dups) and irrelevant to the
oracle, which runs DuckDB over the same files.

Usage: python3 tools/gen_sf1.py [outDir=/tmp/sf1]
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000
SHARDS = 10

# table -> int64/int32 key columns to offset per shard
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main(out_dir: str) -> None:
    con = duckdb.connect()
    for t, keys in KEYS.items():
        src = f"{SRC}/{t}.parquet"
        if not keys:  # fixed dimension tables: copy once
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{out_dir}/{t}.parquet' (FORMAT parquet)")
        else:
            names = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
            sel = ", ".join(
                f"CAST(t.{n} + s.i * {STRIDE} AS BIGINT) AS {n}" if n in keys else f"t.{n}"
                for n in names
            )
            con.execute(
                f"COPY (SELECT {sel} FROM '{src}' t CROSS JOIN (SELECT UNNEST(range({SHARDS})) AS i) s) "
                f"TO '{out_dir}/{t}.parquet' (FORMAT parquet)"
            )
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    import os

    os.makedirs(out, exist_ok=True)
    main(out)
