#!/usr/bin/env python3
"""Preflight mirror of the driver's t2 oracle check (SURVEY.md §5 L2).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Replicates the driver's comparator as closely as possible so local
red/green predicts CORRECTNESS_r{N}.json:
  1. Spark side loaded from the Verify parquet THROUGH PANDAS (pyarrow),
     so parquet DECIMAL columns arrive as decimal.Decimal objects and
     array columns as numpy arrays — exactly the dtypes the driver sees.
  2. Oracle side fetched from DuckDB through pandas, so DECIMAL results
     arrive as float64 — again the driver's view.
  3. Columns sorted by name, rows sorted by all columns via pandas
     sort_values (a numpy-array cell raises TypeError here, replicating
     the driver's "unhashable type" crash).
  4. STRICT hash compare of the sorted frames via per-cell str():
     Decimal('0.500000') != 0.5 — a decimal-vs-double dtype drift fails
     here even though the values are numerically equal.
On a strict-hash failure a tolerant row diff (1e-9 relative) is printed
to distinguish canonicalization drift from genuinely wrong answers.
Exit code 0 iff every checked query matches the strict hash.
"""
import sys, json, glob, math, os, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_frame(df):
    """Driver-style canonical form: columns sorted by name, rows sorted by
    every column. Raises TypeError on unhashable (array) cells, like the
    driver does."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cell_str(v):
    """Strict per-cell canonical string, calibrated to the driver's
    observed behavior (CORRECTNESS_r01): string-form compare, so
    Decimal('0.500000') != 0.5 (trailing-scale drift fails) but
    Decimal('53129.178305') == 53129.178305 (identical renderings pass,
    as they did for udaf_weighted_avg in round 1). Dates and
    midnight timestamps normalize to the same form (fn_date passed
    round 1 with Spark DATE vs DuckDB TIMESTAMP-at-midnight)."""
    import datetime
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    # pandas NaT / NA
    try:
        if v is pd.NaT or v is pd.NA:
            return "<null>"
    except Exception:
        pass
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.strftime("%Y-%m-%d")
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    return str(v)


def frame_hash(df):
    # cell_str distinguishes NaN ("<nan>") from NULL ("<null>") — NaN-vs-NULL
    # drift between engines must FAIL the hash, and diagnose() must agree
    # with the hash about every cell.
    h = hashlib.sha256()
    for col in df.columns:
        h.update(col.encode())
        for v in df[col]:
            h.update(cell_str(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def tolerant_eq(a, b):
    """Loose numeric compare for the diagnostic diff only."""
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (TypeError, ValueError):
        return str(a) == str(b)


def diagnose(name, sdf, ddf):
    """On strict-hash failure: find the first strict mismatch and say
    whether it is dtype drift (tolerant-equal) or a wrong value."""
    for i in range(len(sdf)):
        for col in sdf.columns:
            sv, dv = sdf[col].iloc[i], ddf[col].iloc[i]
            if cell_str(sv) != cell_str(dv):
                kind = ("DTYPE-DRIFT (values tolerant-equal)"
                        if tolerant_eq(sv, dv) else "VALUE MISMATCH")
                print(f"  {kind} row {i} col {col}: "
                      f"spark={cell_str(sv)} duck={cell_str(dv)}")
                return
    print("  (no per-cell strict mismatch found — ordering drift?)")


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
        # Spark side through pandas/pyarrow: decimals -> decimal.Decimal,
        # arrays -> numpy arrays (the driver's dtype view).
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark parquet load error: {e}")
            failures += 1
            continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rowcount spark={len(sdf)} duck={len(ddf)}")
            failures += 1
            continue
        try:
            sdf, ddf = canon_frame(sdf), canon_frame(ddf)
        except TypeError as e:
            print(f"FAIL {name}: comparator crash (driver would too): {e}")
            failures += 1
            continue
        sh, dh = frame_hash(sdf), frame_hash(ddf)
        if sh != dh:
            print(f"FAIL {name}: strict hash mismatch ({len(sdf)} rows)")
            diagnose(name, sdf, ddf)
            failures += 1
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    print(f"--- {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
