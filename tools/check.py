#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and diff. Usage:
    python3 tools/check.py <sfDir> <verifyOutDir> [--threads N]

Driver-divergence tripwire (round 11): the DuckDB version is printed
on every run, and `--threads 1` re-runs the oracles single-threaded —
so a red cell that only appears in ANOTHER DuckDB build/config is
diagnosable from round-log artifacts (version line + a threads-1
replay) instead of a judge re-run.

Type-aware since round 9: in addition to the value diff, the DuckDB
logical type of every oracle column must EXACTLY equal the type DuckDB
infers when reading the Spark parquet output. This is what the
value-level compare cannot see — DuckDB `sum(BIGINT)` returns HUGEINT
(int128) while Spark writes LONG/BIGINT, and the driver's hash of the
two differs even when every value is equal (the q150/q205/q210 class).
An oracle with an un-CAST `sum(...)` now fails HERE, not at the driver.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir, threads=None):
    con = duckdb.connect()
    print(f"duckdb version: {duckdb.__version__} "
          f"(library {con.sql('PRAGMA version').fetchone()[0]})"
          + (f", threads={threads}" if threads else ""))
    if threads:
        con.execute(f"PRAGMA threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = list(got_rel.columns)
            got_types = [str(t) for t in got_rel.types]
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp_types = [str(t) for t in exp_rel.types]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            fail += 1
            continue
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            fail += 1
            continue
        # DECIMAL lint (round-11 q303/q341 class): the driver's hasher
        # canonicalizes DECIMAL differently from this repr-compare, so a
        # DECIMAL output column can pass HERE and still fail the driver
        # hash. Fail fast on either side emitting DECIMAL.
        dec = [(c, t, side) for cols, types, side in
               ((got_cols, got_types, "spark"), (exp_cols, exp_types, "oracle"))
               for c, t in zip(cols, types) if "DECIMAL" in t.upper()]
        if dec:
            print(f"FAIL {name}: DECIMAL output column(s) — driver hash "
                  f"canonicalization class; cast exact integers to BIGINT:")
            for c, t, side in dec:
                print(f"    {side}.{c}: {t}")
            fail += 1
            continue
        # Type gate: oracle column type must byte-equal the type DuckDB
        # reads back from the Spark parquet (sorted by column name, the
        # driver's own ordering).
        tdiff = [(got_cols[a], got_types[a], exp_types[b])
                 for a, b in zip(gi, ei) if got_types[a] != exp_types[b]]
        if tdiff:
            print(f"FAIL {name}: column TYPE mismatch (spark vs oracle):")
            for c, gt, et in tdiff:
                print(f"    {c}: spark={gt} oracle={et}"
                      + ("  <-- un-CAST DuckDB aggregate? wrap in "
                         "CAST(... AS BIGINT/DOUBLE)"
                         if et in ("HUGEINT", "INT128") else ""))
            fail += 1
            continue
        g = [tuple(canon(r[i]) for i in gi) for r in got]
        e = [tuple(canon(r[i]) for i in ei) for r in exp]
        if g == e:
            print(f"OK   {name}: {len(g)} rows")
            ok += 1
        else:
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at row {i}:\n    got {a}\n    exp {b}")
                    break
            if len(g) != len(e) and g and e:
                print(f"  got head {g[0]}\n  exp head {e[0]}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    thr = None
    if "--threads" in argv:
        i = argv.index("--threads")
        thr = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], thr))
