#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables and compare per query.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def fresh_con(sf_dir):
    # One connection PER ORACLE: buffer-manager memory accumulates
    # across queries on a shared connection, and at sf0.1 the heavy
    # LSH replays then abort with OOM even though each passes alone.
    # An in-memory DuckDB also has NO temp directory by default, so a
    # heavy oracle aborts instead of spilling — give it a spill dir
    # and a bounded budget so the check survives running next to a
    # Spark JVM too.
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        con = fresh_con(sf_dir)
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            gcols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        finally:
            con.close()
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            continue
        gi = [gcols.index(c) for c in sorted(gcols)]
        wi = [wcols.index(c) for c in sorted(wcols)]
        gset = sorted((tuple(norm(r[i]) for i in gi) for r in got), key=repr)
        wset = sorted((tuple(norm(r[i]) for i in wi) for r in want), key=repr)
        if gset == wset:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            for g, w in list(zip(gset, wset))[:200]:
                if g != w:
                    print(f"  spark={g}\n  duck ={w}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
