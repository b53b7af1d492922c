#!/usr/bin/env python3
"""Local mimic of the driver's t2 gate: compare Verify's parquet dumps
against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/check.py <sfdir> <verify_out_dir> [query...]
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # array-valued cells (numpy arrays / lists) -> tuples so == is scalar
    if hasattr(v, "tolist"):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def load_rows(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    rows = [tuple(norm(x) for x in r) for r in df.itertuples(index=False, name=None)]
    return cols, rows

# DuckDB types Spark can never emit — an oracle column with one of these means
# a missing CAST (DuckDB widens SUM(BIGINT)→HUGEINT, etc.).  The driver's
# hasher is dtype-sensitive (int128 ≠ int64), so these ship as red rows even
# when values are identical; this local gate makes them fail pre-commit.
FORBIDDEN_DUCK_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}

def dtype_violations(rel):
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) in FORBIDDEN_DUCK_TYPES]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pq = os.path.join(outdir, name)
        if not os.path.isdir(pq):
            print(f"MISSING  {name}: no parquet dump")
            n_fail += 1
            continue
        try:
            got_cols, got = load_rows(con.sql(f"SELECT * FROM '{pq}/*.parquet'"))
            exp_rel = con.sql(sql)
            dtv = dtype_violations(exp_rel)
            exp_cols, exp = load_rows(exp_rel)
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        if dtv:
            # driver's hasher is dtype-sensitive: an uncast HUGEINT oracle
            # column hash-mismatches even when values are identical
            print(f"DTYPE    {name}: oracle columns need CAST: {dtv}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"SCHEMA   {name}: spark={got_cols} duckdb={exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"ROWCOUNT {name}: spark={len(got)} duckdb={len(exp)}")
            n_fail += 1
            continue
        # exact compare in emitted order first, then sorted (driver may do either)
        if got == exp:
            print(f"PASS     {name} ({len(got)} rows)")
            n_pass += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
        print(f"VALUES   {name}: {len(bad)}/{len(got)} rows differ; first: ")
        for i, g, e in bad[:3]:
            print(f"  row {i}:\n    spark : {g}\n    duckdb: {e}")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
