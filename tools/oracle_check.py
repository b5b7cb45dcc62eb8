#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir>
For each <name>.parquet dir under verify_out_dir, runs the matching SQL
from oracle_sql.json in DuckDB over the sf_dir tables, sorts columns by
name, sorts rows, and hash-compares values.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize floats to 9 significant digits to absorb last-bit noise
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)
    rows = sorted(",".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()

fails = 0
for name in sorted(oracle):
    d = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        print(f"MISS  {name}: no spark output")
        fails += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ORAERR {name}: {e}")
        fails += 1
        continue
    sh, dh = canon(spark_df), canon(duck_df)
    # Dtype divergence is invisible to the %.9g canon below —
    # %.9g(484500.0) == str(484500) — but the driver's own canon is
    # dtype-sensitive (the three-round s26 red: DuckDB HUGEINT -> pandas
    # float64 vs Spark BIGINT). Gate on the EXACT dtype, not just the
    # float/integer kind: int32-vs-int64 or decimal-scale drift could hide
    # behind a kind check the same way the float kind hid behind %.9g.
    # EQUIV holds the documented unavoidable representation differences
    # between pandas-read-Spark-parquet and DuckDB's .df() materialization
    # (pairs are directionless; both orders are accepted):
    #  - ('object', X) for non-numeric kinds: pyarrow→pandas yields dtype
    #    'object' for strings/arrays where DuckDB may type the same values
    #    (and vice versa); value equality is still enforced by the hash.
    EQUIV = {
        frozenset({"object", "string"}),
        # pandas reads Spark's TIMESTAMP(us) parquet as datetime64[ns]
        # (pyarrow default promotion) while DuckDB's .df() keeps us.
        # Spark timestamps ARE microsecond-precision, so the ns side
        # cannot carry extra information and the values hash identically
        # (measured: the only exact-dtype divergence across all 197 keys
        # at sf0.01 — e1/e2/e7/e12/e13's window/session timestamps).
        frozenset({"datetime64[ns]", "datetime64[us]"}),
    }
    dt = lambda df: {c: str(df[c].dtype) for c in df.columns}
    sk, dk = dt(spark_df), dt(duck_df)
    # EQUIV-matched pairs print as notes on EVERY run (ADVICE r16): the
    # allowlist was validated at sf0.01, and other scales / regenerated
    # testdata can produce different benign representation pairs (pyarrow
    # nullable-int promotion, int32-vs-int64 from a changed writer) — a
    # run that trips a NEW pair must be diagnosable from its own output
    # so the allowlist can be extended with evidence, not archaeology.
    dt_equiv = {c: (sk[c], dk[c]) for c in sk
                if c in dk and sk[c] != dk[c]
                and frozenset({sk[c], dk[c]}) in EQUIV}
    if dt_equiv:
        print(f"NOTE  {name}: EQUIV-allowlisted dtype pairs {dt_equiv}")
    dt_diff = {c: (sk[c], dk[c]) for c in sk
               if c in dk and sk[c] != dk[c]
               and frozenset({sk[c], dk[c]}) not in EQUIV}
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        print(f"SCHEMA {name}: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        fails += 1
    elif dt_diff:
        print(f"DTYPE {name}: exact dtype mismatch {dt_diff}")
        fails += 1
    elif len(spark_df) != len(duck_df):
        print(f"ROWS  {name}: spark={len(spark_df)} duck={len(duck_df)}")
        fails += 1
    elif sh != dh:
        print(f"HASH  {name}: {len(spark_df)} rows, value mismatch")
        fails += 1
    else:
        print(f"OK    {name}: {len(spark_df)} rows")
# queries with no oracle: rows-only check
for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
    name = os.path.basename(d)
    if os.path.isdir(d) and name not in oracle:
        files = glob.glob(os.path.join(d, "*.parquet"))
        n = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
        print(f"{'OK' if n > 0 else 'EMPTY'}    {name}: rows-only ({n})")
        if n == 0:
            fails += 1
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
