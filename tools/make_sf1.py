#!/usr/bin/env python3
"""Deterministic sf1 tables derived from the driver's sf0.1 testdata.

10x replication with key offsets (join-consistent) for the one measured
decade of scale the round-4 verdict asked for. Derivation rules:

- documents: doc_id += r*5000. Replica 0 is byte-identical to sf0.1; in
  replicas 1-9 every word gets an 'r<k>' suffix, which (a) keeps every
  text globally unique (fingerprint/exact-dedup invariants), and (b)
  keeps the 3-gram shingle spaces of different replicas DISJOINT, so the
  brute-force exact-Jaccard oracle's shingle self-join grows linearly in
  replicas instead of quadratically. n_chars is recomputed (it equals
  length(text) in the source data).
- embeddings: vec_id += r*2000; replica 0 verbatim, replicas 1-9 get a
  small deterministic per-(dim, replica) float32 perturbation (no exact
  ties across replicas -> no cross-engine argmax flips).
- orders/customer/lineitem/part: primary/foreign keys offset by
  r*(max+1) consistently (o_custkey with c_custkey, l_orderkey with
  o_orderkey, l_partkey with p_partkey); other columns replicated.
- events: event_id offset; everything else replicated (window aggregates
  just scale 10x).
- EXCEPTION to the uniqueness rule (round-5 advice): NULL/blank texts are
  replicated verbatim into replicas 1-9 (the word-suffix rule has nothing
  to suffix), so "every text globally unique" holds only for non-blank
  texts; the text_fingerprint oracle accordingly counts DISTINCT text,
  and future uniqueness-assuming oracles must not be built on blank rows.
  n_chars is NULL for NULL-text rows.
- nation/region/supplier: copied (dimension tables; nation is the join
  target of the non-replicated c_nationkey).

Usage: python3 tools/make_sf1.py [outDir] [R]   (default target/sf1, R=10;
R=100 + target/sf10 gives the second measured decade)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT unnest(range({R})) AS r")


def write(name: str, sql: str) -> None:
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


write("documents", f"""
  WITH suffixed AS (
    SELECT doc_id + r * 5000 AS doc_id,
           CASE WHEN r = 0 OR text IS NULL OR trim(text) = '' THEN text
                ELSE array_to_string(list_transform(string_split(text, ' '),
                       w -> w || 'r' || r), ' ') END AS text,
           lang, source
    FROM '{SRC}/documents.parquet', reps)
  SELECT doc_id, text, lang, source,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM suffixed ORDER BY doc_id""")

write("embeddings", f"""
  SELECT vec_id + r * 2000 AS vec_id,
         CASE WHEN r = 0 THEN embedding
              ELSE CAST(list_transform(CAST(embedding AS DOUBLE[]),
                (x, i) -> CAST(x + ((i * 2654435761 + r * 40503) % 101 - 50)
                               / 20000.0 AS FLOAT)) AS FLOAT[])
              END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', reps
  ORDER BY vec_id""")

write("events", f"""
  SELECT event_id + r * (SELECT max(event_id) + 1
                         FROM '{SRC}/events.parquet') AS event_id,
         ts, user_id, event_type, value, props
  FROM '{SRC}/events.parquet', reps
  ORDER BY event_id""")

O = con.sql(f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
C = con.sql(f"SELECT max(c_custkey) + 1 FROM '{SRC}/customer.parquet'").fetchone()[0]
P = con.sql(f"SELECT max(p_partkey) + 1 FROM '{SRC}/part.parquet'").fetchone()[0]

write("orders", f"""
  SELECT o_orderkey + r * {O} AS o_orderkey,
         o_custkey + r * {C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', reps ORDER BY o_orderkey""")

write("customer", f"""
  SELECT c_custkey + r * {C} AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', reps ORDER BY c_custkey""")

write("lineitem", f"""
  SELECT l_orderkey + r * {O} AS l_orderkey,
         l_partkey + r * {P} AS l_partkey,
         l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
         l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', reps ORDER BY l_orderkey, l_linenumber""")

write("part", f"""
  SELECT p_partkey + r * {P} AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet', reps ORDER BY p_partkey""")

for dim in ("nation", "region", "supplier"):
    write(dim, f"SELECT * FROM '{SRC}/{dim}.parquet'")

print(f"sf1 written to {OUT}")
