#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (t2): run graft.Verify
output against DuckDB oracles over the same parquet tables, compare
exactly (schema by column name, values after sorting columns by name).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — strict
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_path = os.path.join(out_dir, name)
        if not os.path.isdir(res_path):
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            # explicit file order: DuckDB's parallel parquet scan may
            # emit multi-row-group files out of order under load (seen
            # once on a 600k-row result at sf0.1) — the comparison is
            # row-ordered, so pin the order instead of relying on
            # preserve_insertion_order
            got = con.execute(
                f"SELECT * EXCLUDE (file_row_number) "
                f"FROM read_parquet('{res_path}/*.parquet', file_row_number=true) "
                f"ORDER BY file_row_number")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # sort columns by name (driver behavior), keep row order
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        eperm = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = [tuple(canon(r[i]) for i in gperm) for r in got_rows]
        e = [tuple(canon(r[i]) for i in eperm) for r in exp_rows]
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} != {len(e)}")
            n_fail += 1
            continue
        if g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark : {g[bad]}")
            print(f"  duckdb: {e[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    # rows-only queries (no oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                status = "ROWS-ONLY-PASS" if n > 0 else "ROWS-ONLY-EMPTY"
                print(f"{status} {d} ({n} rows)")
            except Exception as e:
                print(f"ROWS-ONLY-FAIL {d}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
