#!/usr/bin/env python3
"""Dev-time oracle output-type audit (run manually; uses the driver-side
duckdb install — NOT a library dependency of the Scala engine).

The driver's correctness hash is value-TYPE-sensitive: DuckDB's bare
SUM over integer columns returns HUGEINT (arrow decimal128) while Spark
emits int64, so an uncast integer aggregate hash-mismatches on
bit-identical values (this cost text_vocab_stats three red rounds).
This script DESCRIBEs every registered oracle and flags any output
column whose DuckDB type can't be emitted by Spark: run it after adding
an oracle, before the round's Verify sweep.

Usage: python3 tools/oracle_type_audit.py [oracle_sql.json] [sf_dir]
(defaults assume a fresh `sbt "runMain graft.Verify <sf> <out>"` dump)
"""
import duckdb, json, sys

oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# types Spark cannot write to parquet as-is -> guaranteed hash mismatch
BAD = ("HUGEINT", "UHUGEINT")

oracle = json.load(open(oracle_path))
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

bad = []
for name, sql in sorted(oracle.items()):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        bad.append((name, f"DESCRIBE failed: {e}"))
        continue
    hits = [(c, ty) for c, ty, *_ in desc
            if ty in BAD or ty.startswith("DECIMAL(38")]
    if hits:
        bad.append((name, f"un-Spark-able output types {hits} — wrap in CAST(... AS BIGINT/DOUBLE)"))

if bad:
    for name, msg in bad:
        print(f"FAIL {name}: {msg}")
    sys.exit(1)
print(f"OK: {len(oracle)} oracles, no HUGEINT/decimal128 output columns")
