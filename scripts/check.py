#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify via sbt
(outside this script), then compare each <out>/<name> parquet against the
DuckDB result of oracle_sql.json on the same sf dir.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
"""
import datetime
import decimal
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # NOTE: no list/ndarray rescue here — the driver's compare sorts raw
        # object columns and CRASHES on array/map cells. Mirror that so any
        # query emitting a non-scalar column fails locally first.
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = connect(sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_run = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        # recycle the connection periodically: DuckDB's allocator
        # fragments across a couple hundred disparate queries in one
        # process and starts throwing spurious OutOfMemoryException
        n_run += 1
        if n_run % 20 == 0 or name.startswith(("slt_fuzz", "fz_")):
            con.close()
            con = connect(sf_dir)
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            # Read the SPARK side via pandas/pyarrow, NOT through the
            # DuckDB connection: the driver reads our parquet with
            # pyarrow, so a DECIMAL-typed result column surfaces there
            # as object-dtype decimal.Decimal cells and hash-splits
            # against the oracle's float64 — reading both sides through
            # one DuckDB coerced both identically and made this gate
            # structurally blind to that class (r9 adjudication).
            mine = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
            # pyarrow maps date32 -> object(datetime.date); lift it to
            # datetime64 like the DuckDB oracle side so the kind check
            # compares semantics, not arrow's python boxing
            # scan the FULL column, not the head: object columns from
            # heterogeneous part files can change python type mid-column
            # and a head-sniff would skip the lift / miss the gate
            for c in mine.columns:
                cells = mine[c].dropna()
                if mine[c].dtype == object and len(cells) and \
                        all(isinstance(x, datetime.date) and
                            not isinstance(x, datetime.datetime)
                            for x in cells):
                    mine[c] = pd.to_datetime(mine[c])
            dec_cols = [c for c in mine.columns
                        if mine[c].dtype == object and any(
                            isinstance(x, decimal.Decimal)
                            for x in mine[c].dropna())]
            if dec_cols:
                print(f"FAIL {name}: raw DECIMAL result column(s) "
                      f"{dec_cols} — driver-side representation split; "
                      f"pin as STRING digits or DOUBLE-after-ROUND")
                n_fail += 1
                continue
            mine = normalize(mine)
            oracle = normalize(con.execute(sql).df())
            if list(mine.columns) != list(oracle.columns):
                print(f"FAIL {name}: columns {list(mine.columns)} vs "
                      f"{list(oracle.columns)}")
                n_fail += 1
                continue
            # The driver's hash is type-sensitive by KIND, not width:
            # int32-vs-int64 rows were green in its round-8 artifact
            # while SUM->HUGEINT (surfacing as float64/object) and
            # FLOOR->float64 rows failed. Mirror that: same-kind width
            # differences warn, cross-kind differences FAIL.
            dt = [(c, str(mine[c].dtype), str(oracle[c].dtype))
                  for c in mine.columns
                  if mine[c].dtype.kind != oracle[c].dtype.kind]
            if dt:
                print(f"FAIL {name}: dtype {dt}")
                n_fail += 1
                continue
            dw = [(c, str(mine[c].dtype), str(oracle[c].dtype))
                  for c in mine.columns
                  if str(mine[c].dtype) != str(oracle[c].dtype)]
            if dw:
                print(f"WARN {name}: dtype width {dw}")
            if len(mine) != len(oracle):
                print(f"FAIL {name}: rows {len(mine)} vs {len(oracle)}")
                n_fail += 1
                continue
            # exact value compare, NaN==NaN
            neq = []
            for c in mine.columns:
                a, b = mine[c], oracle[c]
                bad = ~((a == b) | (a.isna() & b.isna()))
                if bad.any():
                    neq.append((c, int(bad.sum()),
                                a[bad].head(3).tolist(),
                                b[bad].head(3).tolist()))
            if neq:
                print(f"FAIL {name}: value diffs {neq}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(mine)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
