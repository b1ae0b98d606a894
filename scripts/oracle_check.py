#!/usr/bin/env python3
"""Preflight mirror of the driver's t2 oracle check (SURVEY.md §5 L2).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Loads each Spark result parquet written by `graft.Verify`, executes the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet, sorts columns by name (as the driver does), and compares row by
row. Exit code 0 iff every checked query matches exactly.
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    """Canonicalise a cell for comparison."""
    if v is None:
        return None
    # numpy / pyarrow scalars → python
    if hasattr(v, "item") and not isinstance(v, (list, tuple)):
        try:
            v = v.item()
        except Exception:
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    # decimal.Decimal, datetime, str, int pass through via str for stability
    return v

def eq(a, b):
    a, b = canon(a), canon(b)
    if a is None or b is None:
        return a is b or a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    import decimal, datetime
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        try:
            return decimal.Decimal(str(a)) == decimal.Decimal(str(b))
        except Exception:
            return str(a) == str(b)
    return a == b or str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            failures += 1
            continue
        # coalesce(1) → single file; file order == query order
        spark_rel = con.execute(
            "SELECT * FROM read_parquet(?)", [files]).fetch_arrow_table()
        try:
            duck_rel = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s_cols, d_cols = sorted(spark_rel.column_names), sorted(duck_rel.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        s_rows = list(zip(*[spark_rel.column(c).to_pylist() for c in s_cols]))
        d_rows = list(zip(*[duck_rel.column(c).to_pylist() for c in d_cols]))
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            failures += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if not all(eq(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            i, sr, dr = bad
            print(f"FAIL {name}: row {i} differs (cols {s_cols})")
            print(f"  spark: {sr}")
            print(f"  duck : {dr}")
            failures += 1
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    print(f"--- {failures} failures")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
