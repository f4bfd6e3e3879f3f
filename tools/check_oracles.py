"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() in DuckDB
at the given sf dir; compare row count, column names, dtype kinds, and
order-insensitive values.

Both sides round-trip through pandas (Spark .toPandas(), DuckDB .df())
because that is the coercion the driver's hash path applies — DuckDB
HUGEINT (e.g. sum() over integer columns) becomes float64 there while
Spark emits int64, a class of drift fetchall() hides (it yields Python
ints for HUGEINT). Canonical values carry a dtype-kind tag so an int 5
and a float 5.0 do NOT compare equal, matching the driver.

Usage: python tools/check_oracles.py [sf_dir] [only_query_substr]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

import __spark_entry__ as entry
from irkit_spark.config import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon_val(v, kind):
    # kind: numpy dtype.kind of the column ('i','u','f','b','O','M',...)
    if v is None:
        return "null"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v:.9g}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        # a python int in a float-kind column is still float on the
        # driver's hash path
        if kind == "f":
            return f"f:{float(v):.9g}"
        return f"i:{v}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_val(x, "O") for x in v) + "]"
    if isinstance(v, bytes):
        return f"y:{v.hex()}"
    s = str(v)
    return f"s:{s}"


def canon(pdf):
    cols = sorted(pdf.columns)
    kinds = {c: pdf[c].dtype.kind for c in cols}
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        vals = []
        for c, v in zip(cols, row):
            try:
                isna = v is None or (isinstance(v, float) and math.isnan(v))
            except (TypeError, ValueError):
                isna = False
            if isna and kinds[c] == "f":
                vals.append("nan")
            else:
                vals.append(_canon_val(v, kinds[c]))
        out.append(tuple(vals))
    out.sort()
    return out


def kindmap(pdf):
    def k(d):
        if d.kind in ("i", "u"):
            return "int"
        return {"f": "float", "b": "bool", "M": "ts"}.get(d.kind, "obj")
    return {c: k(pdf[c].dtype) for c in pdf.columns}


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("oracle-check", "*", 32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, os_ = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and only not in name:
            continue
        try:
            spdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"rows-only {name}: {len(spdf)} rows "
                  f"(cols {list(spdf.columns)})")
            continue
        try:
            opdf = con.sql(os_[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            n_fail += 1
            continue
        ok = True
        if sorted(spdf.columns) != sorted(opdf.columns):
            print(f"FAIL {name}: cols spark={list(spdf.columns)} "
                  f"oracle={list(opdf.columns)}")
            ok = False
        elif len(spdf) != len(opdf):
            print(f"FAIL {name}: rowcount spark={len(spdf)} "
                  f"oracle={len(opdf)}")
            ok = False
        else:
            sk, ok_ = kindmap(spdf), kindmap(opdf)
            bad = {c for c in sk if sk[c] != ok_[c]
                   # empty frames degrade to object dtype; skip
                   and len(spdf) > 0}
            if bad:
                print(f"FAIL {name}: dtype drift "
                      f"{[(c, sk[c], ok_[c]) for c in sorted(bad)]}")
                ok = False
            else:
                cs, co = canon(spdf), canon(opdf)
                if cs != co:
                    diff = [i for i, (a, b) in enumerate(zip(cs, co))
                            if a != b]
                    print(f"FAIL {name}: {len(diff)} mismatched rows; "
                          f"first: spark={cs[diff[0]]} "
                          f"oracle={co[diff[0]]}")
                    ok = False
        if ok:
            print(f"PASS {name}: {len(spdf)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
