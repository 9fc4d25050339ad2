#!/usr/bin/env python3
"""Pre-flight lint for SparkEntry.oracleSql: every statement must BIND.

Round-11 post-mortem: one oracle SQL string hit a DuckDB-1.0.0 INTERNAL
binder assertion ("Failed to bind column reference"); because internal
errors invalidate the whole database, the driver's shared oracle
connection died and every alphabetically-later entry went unverified.
This lint makes that failure mode impossible to ship again:

  * a FRESH DuckDB connection per statement — a binder crash flags ONE
    entry instead of poisoning the run;
  * each statement EXECUTED as `SELECT count(*) FROM (<sql>) AS _q`
    against the tiny sf0.001 tables — EXPLAIN alone does NOT reproduce
    the round-11 crash (verified: the bad unnest+JOIN USING form passes
    EXPLAIN and only faults in the executor), so binding is not enough;
  * every RESULT COLUMN TYPE checked against the Spark-expressible set
    (round-15 post-mortem: `sum(BIGINT)` returns HUGEINT, and the
    driver's dataframe/arrow hash path renders HUGEINT as
    float64/decimal128 while Spark emits int64 — a permanent
    hash-mismatch that fetchall()-based local replay can NEVER see.
    Types outside the whitelist — HUGEINT, DECIMAL, UHUGEINT,
    INTERVAL, ... — fail the lint; wrap the offending expression in
    CAST(... AS BIGINT/DOUBLE) in the FINAL projection).

Usage:
  python3 tools/lint_oracles.py <oracle_sql.json> [sfDir]

<oracle_sql.json> is the file graft.Verify dumps. sfDir defaults to
/root/testdata/sf0.001 (smallest scale — execution cost per statement
is milliseconds).
Exit code 0 = all statements bind; 1 = at least one failed (each
failure printed with the entry name and the DuckDB error).
"""
import json
import os
import sys

import duckdb

# single source of truth for the table list: check.py (the
# differential checker) — a drift between the two would make the lint
# report spurious missing-table failures or silently under-register
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, TYPE_CANARY, spark_expressible  # noqa: E402


def lint_one(name, sql, sf_dir):
    """Execute one statement on its own connection. Returns error or None."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        con.execute(f"SELECT count(*) FROM ({sql}) AS _q").fetchone()
        desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) AS _q").fetchall()
        bad = [] if name in TYPE_CANARY else [
            (c, t) for c, t, *_ in desc if not spark_expressible(t)]
        if bad:
            return ("TypeError: non-Spark-expressible result column(s) " +
                    ", ".join(f"{c}:{t}" for c, t in bad) +
                    " — CAST in the final projection (round-15 HUGEINT class)")
        return None
    except Exception as e:  # noqa: BLE001 — report every failure kind
        return f"{type(e).__name__}: {e}"
    finally:
        try:
            con.close()
        except Exception:
            pass


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    oracle_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    oracle = json.load(open(oracle_path))
    failures = {}
    for name in sorted(oracle):
        err = lint_one(name, oracle[name], sf_dir)
        if err is not None:
            failures[name] = err
            print(f"[FAIL] {name}: {err.splitlines()[0]}")
    print(f"linted {len(oracle)} oracle statements: "
          f"{len(oracle) - len(failures)} bind, {len(failures)} fail")
    if failures:
        for name, err in failures.items():
            print(f"\n=== {name} ===\n{oracle[name]}\n--- error ---\n{err}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
