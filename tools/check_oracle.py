#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/vout

Reads each <name>.parquet produced by graft.Verify, runs the matching oracle
SQL from oracle_sql.json in DuckDB over the same testdata parquet tables, and
compares: row count, sorted column names, and a hash of all values (rows
sorted, columns sorted by name, floats rounded to 6 absolute decimals).
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    out = []
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            out.append(col.round(6).astype(str))
        else:
            out.append(col.astype(str))
    blob = "\x01".join("\x02".join(r) for r in zip(*[c.tolist() for c in out])) if len(df) else ""
    return hashlib.sha256(blob.encode()).hexdigest()

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Verify emits each oracle under both 'q_x' and 'q_x.parquet' (the
    # driver keys by filename); both resolve to the same output dir —
    # NORMALIZE (don't drop) so a file keyed only by filename still gates,
    # and fail loudly if the two keys ever carry different SQL.
    norm = {}
    for k, v in oracle.items():
        b = k.removesuffix(".parquet")
        assert norm.get(b, v) == v, f"conflicting oracle SQL for {b}"
        norm[b] = v
    oracle = norm
    n_pass = n_fail = 0
    # Type lint (r12 rank INT, r13 window-SUM HUGEINT): DESCRIBE each oracle
    # and flag result columns whose DuckDB type Spark cannot emit — the gate's
    # hash is type-sensitive, so an uncast SUM()/window-SUM that widens to
    # HUGEINT fails hash_match even when every value is identical. This lint
    # needs no Spark output, so it catches the class even for queries added
    # after the last Verify run.
    WIDENED = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}
    n_lint = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE {sql}").df()
        except Exception as e:
            print(f"LINT {name}: describe failed: {e}"); n_lint += 1; continue
        # Substring match, not top-level-token match: a widened type nested
        # inside LIST/STRUCT ('HUGEINT[]', 'STRUCT(open HUGEINT, ...)') is
        # exactly as hash-fatal as a scalar one.
        bad = [(r["column_name"], r["column_type"]) for _, r in desc.iterrows()
               if any(w in r["column_type"] for w in WIDENED)]
        if bad:
            print(f"LINT {name}: DuckDB-widened column types Spark can't emit "
                  f"(CAST them in the oracle): {bad}")
            n_lint += 1
    if n_lint:
        print(f"{n_lint} oracle(s) failed the type lint\n")
    for name, sql in sorted(oracle.items()):
        # Verify writes a <name>.parquet directory (driver contract); accept
        # the older extension-less layout too.
        files = glob.glob(f"{outdir}/{name}.parquet/*.parquet") or glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        ok_rows = len(spark_df) == len(duck_df)
        ok_cols = sorted(spark_df.columns) == sorted(duck_df.columns)
        ok_hash = ok_rows and ok_cols and canon(spark_df) == canon(duck_df)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}, cols_ok={ok_cols}, hash_ok={ok_hash}")
            if ok_rows and ok_cols:
                s = spark_df[sorted(spark_df.columns)].sort_values(by=sorted(spark_df.columns)).reset_index(drop=True)
                dd = duck_df[sorted(duck_df.columns)].sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
                for c in s.columns:
                    if not s[c].astype(str).equals(dd[c].astype(str)):
                        diff = (s[c].astype(str) != dd[c].astype(str))
                        i = diff.idxmax()
                        print(f"  first diff col={c} row={i}: spark={s[c][i]!r} duck={dd[c][i]!r} (n_diff={diff.sum()})")
            n_fail += 1
    # queries with no oracle: rows-only
    for pdir in sorted(glob.glob(f"{outdir}/q_*")):
        name = os.path.basename(pdir).removesuffix(".parquet")
        if name not in oracle:
            files = glob.glob(f"{pdir}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{'ROWS' if n > 0 else 'EMPTY'} {name}: {n} rows (no oracle)")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_lint} type-lint")
    return 1 if (n_fail or n_lint) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
