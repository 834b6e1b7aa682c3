#!/usr/bin/env python3
"""Dev-side sf1 soak-data generator (driver tables are read-only; sf1 is not shipped).

Builds a deterministic 10x scale-up of /root/testdata/sf0.1 by unioning ten
key-offset shards: every entity key (custkey, orderkey, partkey, suppkey,
event_id, user_id, doc_id, vec_id) in shard i is offset by i*STRIDE, so all
foreign-key joins land within the shard and the result is a valid corpus 10x
the rows. Non-key payloads (text, embeddings, timestamps) repeat across
shards — realistic for a web corpus (exact dups) and irrelevant to the
oracle, which runs DuckDB over the same files.

`events` goes through pyarrow, not DuckDB: its `ts` column must stay
TIMESTAMP(NANOS) — the engine reads it with nanosAsLong=true as BIGINT
nanoseconds, exactly like the driver-written original — and DuckDB's parquet
writer silently downcasts nanos to micros.

Usage: python3 tools/gen_sf1.py [outDir=/tmp/sf1]
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000
SHARDS = 10

# table -> key columns to offset per shard
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


def scale_arrow(table_name: str, keys: list, out_path: str) -> int:
    t = pq.read_table(f"{SRC}/{table_name}.parquet")
    shards = []
    for i in range(SHARDS):
        s = t
        for k in keys:
            idx = s.schema.get_field_index(k)
            s = s.set_column(idx, k, pc.add(s[k], i * STRIDE))
        shards.append(s)
    out = pa.concat_tables(shards)
    pq.write_table(out, out_path)  # parquet 2.6: timestamp[ns] stays NANOS
    return out.num_rows


def main(out_dir: str) -> None:
    con = duckdb.connect()
    for t, keys in KEYS.items():
        src = f"{SRC}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if t == "events":
            n = scale_arrow(t, keys, dst)
        elif not keys:  # fixed dimension tables: copy once
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT parquet)")
            n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        else:
            names = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
            sel = ", ".join(
                f"CAST(t.{n} + s.i * {STRIDE} AS BIGINT) AS {n}" if n in keys else f"t.{n}"
                for n in names
            )
            con.execute(
                f"COPY (SELECT {sel} FROM '{src}' t CROSS JOIN (SELECT UNNEST(range({SHARDS})) AS i) s) "
                f"TO '{dst}' (FORMAT parquet)"
            )
            n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    main(out)
