#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every parquet table in
<sfDir> as a DuckDB view, runs each oracle, and compares against the
Spark-produced parquet in <verifyOutDir>/<name>/ — rows, schema-ish
(column names), and a value hash with columns sorted by name.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def is_missing(v):
    # None / NaN / NaT only — the narrow normalization the value compare
    # needs (pandas maps SQL NULL to any of these depending on dtype).
    if v is None:
        return True
    try:
        return v != v  # NaN/NaT are the only values unequal to themselves
    except Exception:
        return False

def norm(df):
    # sort columns by name; values to python objects
    cols = sorted(df.columns)
    return df[cols]

def plain(v):
    # numpy arrays / lists (LIST-typed columns) to nested python lists so
    # == is a scalar bool, never an elementwise array
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return [plain(x) for x in v]
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_path = f"{out_dir}/{name}"
        files = sorted(glob.glob(f"{spark_path}/*.parquet"))
        if not files:
            results[name] = "MISSING spark output"
            n_fail += 1
            continue
        try:
            # read ALL parts in name order (a retried task can leave >1)
            spark_df = con.sql(
                "SELECT * FROM read_parquet([" +
                ", ".join(f"'{f}'" for f in files) + "])").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ERROR {type(e).__name__}: {str(e)[:300]}"
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA cols spark={list(s.columns)} duck={list(d.columns)}"
            n_fail += 1
            continue
        if len(s) != len(d):
            results[name] = f"ROWS spark={len(s)} duck={len(d)}"
            n_fail += 1
            continue
        # dtype-strict: the driver hashes materialized values, so an int64
        # column vs a float64 column fails there even when every value
        # compares == in Python (12345 == 12345.0). Both frames come out of
        # duckdb's .df() conversion, so dtypes are comparable apples-to-apples.
        dmis = [(c, str(s[c].dtype), str(d[c].dtype))
                for c in s.columns if s[c].dtype != d[c].dtype]
        if dmis:
            c, a, b = dmis[0]
            results[name] = f"DTYPE col={c}: spark={a} duck={b}"
            n_fail += 1
            continue
        # row-order-sensitive value compare
        mismatch = None
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                a, b = plain(a), plain(b)
                ok = (a == b) or (a is None and b is None) or \
                     (isinstance(a, float) and isinstance(b, float) and (a != a and b != b))
                # pandas NaN/None/NaT normalization ONLY — a blanket
                # str(a)==str(b) fallback would mask int-vs-string and
                # repr-coincidence mismatches the driver's gate catches.
                if not ok and is_missing(a) and is_missing(b):
                    ok = True
                if not ok:
                    mismatch = f"VALUE col={c} row={i}: spark={a!r} duck={b!r}"
                    break
            if mismatch:
                break
        if mismatch:
            results[name] = mismatch
            n_fail += 1
        else:
            results[name] = f"OK ({len(s)} rows)"
            n_pass += 1
    for k, v in results.items():
        print(("PASS " if v.startswith("OK") else "FAIL ") + k + ": " + v)
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracles)} oracled")
    return 0 if n_fail == 0 else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
