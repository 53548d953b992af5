#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped
by `graft.Verify <sfdir> <outdir>`, run the matching oracle SQL from
oracle_sql.json in DuckDB over the raw parquet tables and compare
(row count, column names, values). Strict by default — mirrors a
hash-match — with a float near-miss report to localize precision bugs.

Usage: python3 tools/check_oracle.py <outdir> [sfdir] [name1,name2,...]
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def main():
    outdir = sys.argv[1]
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional subset for fast local iteration
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.query(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_types = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
            quoted = lambda cols: ", ".join(f'"{c}"' for c in cols)
            spark = con.execute(
                f"SELECT {quoted(spark_cols)} FROM spark_rel").fetchall()
            duck_rel = con.query(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_types = dict(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
            duck = con.execute(f"SELECT {quoted(duck_cols)} FROM duck_rel").fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: exception {type(e).__name__}: {str(e)[:300]}")
            continue
        if spark_cols != duck_cols:
            failures.append(name)
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            continue
        # Column TYPES must match too: the round-1 driver gate hashed result
        # types, so DECIMAL(38,s)-vs-(28,s) and HUGEINT-vs-BIGINT divergences
        # failed there while this (then value-only) checker passed.
        type_diffs = [(c, spark_types[c], duck_types[c]) for c in spark_cols
                      if spark_types[c] != duck_types[c]]
        if type_diffs:
            failures.append(name)
            for c, st, dt in type_diffs:
                print(f"FAIL {name}: col {c} type spark={st} duck={dt}")
            continue
        if len(spark) != len(duck):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(spark)} duck={len(duck)}")
            continue
        bad = 0
        for i, (srow, drow) in enumerate(zip(spark, duck)):
            for c, (sv, dv) in zip(spark_cols, zip(srow, drow)):
                if norm_cell(sv) != norm_cell(dv):
                    close = (isinstance(sv, float) and isinstance(dv, float)
                             and math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9))
                    if bad < 5:
                        print(f"  {name} row {i} col {c}: spark={sv!r} duck={dv!r}"
                              f"{' (float near-miss)' if close else ''}")
                    bad += 1
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {bad} mismatched cells / {len(spark)} rows")
        else:
            print(f"PASS {name} ({len(spark)} rows)")
    print()
    if failures:
        print(f"{len(failures)} FAILED: {' '.join(failures)}")
        sys.exit(1)
    print(f"all {len(oracle)} queries match")

if __name__ == "__main__":
    main()
