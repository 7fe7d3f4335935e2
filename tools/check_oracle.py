#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle SQL (from Verify's oracle_sql.json) in DuckDB over the
testdata parquet, loads the corresponding Spark result parquet, and
compares STRICTLY: columns sorted by name, rows sorted by all columns,
exact cell equality (bitwise for floats). Anything that passes here
should pass any reasonable driver compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact, not approximate
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # Fetch both sides through Arrow: DB-API `description` lumps
            # HUGEINT and BIGINT together as NUMBER, so DuckDB's integer-sum
            # widening (sum(BIGINT) -> int128) was invisible here while the
            # driver's type-aware hash caught it (round-2 g3 finding). Arrow
            # schema types (int64 vs decimal128(38,0)) expose it.
            want_tbl = con.execute(sql).arrow()
            want_cols = list(want_tbl.schema.names)
            want_types = {n: str(want_tbl.schema.field(n).type) for n in want_cols}
            want_rows = [tuple(d[c] for c in want_cols) for d in want_tbl.to_pylist()]
            got_tbl = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
            got_cols = list(got_tbl.schema.names)
            got_types = {n: str(got_tbl.schema.field(n).type) for n in got_cols}
            got_rows = [tuple(d[c] for c in got_cols) for d in got_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        wc, wr = canon(want_rows, want_cols)
        gc, gr = canon(got_rows, got_cols)
        if wc != gc:
            print(f"FAIL {name}: columns differ: oracle={wc} spark={gc}")
            n_fail += 1
            continue
        type_diff = {c: (want_types[c], got_types[c]) for c in wc
                     if want_types[c] != got_types[c]}
        if type_diff:
            print(f"FAIL {name}: dtypes differ: {type_diff}")
            n_fail += 1
            continue
        if len(wr) != len(gr):
            print(f"FAIL {name}: row count differs: oracle={len(wr)} spark={len(gr)}")
            n_fail += 1
            continue
        bad = None
        for i, (w, g) in enumerate(zip(wr, gr)):
            if not all(cells_equal(a, b) for a, b in zip(w, g)):
                bad = (i, w, g)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} differs:\n  oracle={bad[1]}\n  spark ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(wr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
