#!/usr/bin/env python3
"""Dev-only emulation of the driver's t2 DuckDB-oracle correctness gate.

Not part of the Scala engine. Usage:
    python3 tools/oracle_check.py <verifyOutDir> <sfDir>

Loads oracle_sql.json from <verifyOutDir>, registers each parquet table in
<sfDir> as a DuckDB view, runs every oracle SQL, loads the Spark result
parquet for the same query, sorts columns by name, and compares cell-by-cell
(exact). Prints PASS/FAIL per query with the first diff.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        # pandas NaT (null timestamp from e.g. LAG's first row) is, like
        # NaN, unequal to itself — without this both frames can hold NaT at
        # the same cell and still "differ" (fuzz seed=7 fz_0387 found this:
        # 3 identical NaT cells, zero real diffs, reported FAIL)
        if v != v:
            return "NaT"
    except (TypeError, ValueError):
        pass
    return v


def main(out_dir, sf_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if exp.dtypes.to_dict() != got.dtypes.to_dict():
            print(f"WARN {name}: dtypes spark={got.dtypes.to_dict()} oracle={exp.dtypes.to_dict()}")
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (e, g) in enumerate(zip(ev, gv)):
                if norm(e) != norm(g) and not (e is None and g is None):
                    bad = (c, i, g, e)
                    break
            if bad:
                break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: first diff col={c} row={i} spark={g!r} oracle={e!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows, {len(exp.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
