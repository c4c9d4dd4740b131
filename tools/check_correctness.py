"""Local simulation of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, sorted column names, and
values (exact for ints/strings, bitwise for doubles after row sorting).
Stricter than the driver's value-hash: if this passes, any reasonable
hash of the same values matches.

Usage: python tools/check_correctness.py [query ...]

A full run (no query args) also writes CORRECTNESS_LOCAL.json — the
machine-readable twin of the printout, committed as the repo's local
proof that every registered query passed the dtype-exact gate on the
current fixtures.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _dtype_class(dt) -> str:
    """Collapse a pandas dtype into a driver-hash-relevant class.

    The driver's value-hash is dtype-sensitive: DuckDB's HUGEINT (from an
    un-cast integer SUM) fetches as float64 while Spark emits int64, and the
    two hash differently even when every value is numerically equal. We
    therefore require the exact same kind AND width on both sides for
    numeric columns; datetimes must agree in kind (unit differences are
    normalized by both engines' Arrow paths); everything else is compared
    as its dtype string.
    """
    from pandas.api import types as pt

    if pt.is_datetime64_any_dtype(dt):
        return "datetime"
    if pt.is_bool_dtype(dt):
        return "bool"
    if pt.is_integer_dtype(dt):
        return f"int{dt.itemsize * 8}"
    if pt.is_float_dtype(dt):
        return f"float{dt.itemsize * 8}"
    return str(dt)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns {scols} vs {dcols}")
        return problems
    for c in scols:
        sk, dk = _dtype_class(spark_pdf[c].dtype), _dtype_class(duck_pdf[c].dtype)
        if sk != dk:
            problems.append(f"col {c} dtype {sk} (spark) vs {dk} (oracle)")
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            ok = (
                x == y
                or (x is None and y is None)
                or (isinstance(x, float) and isinstance(y, float)
                    and (x == y or (math.isnan(x) and math.isnan(y))))
                or (pd.isna(x) and pd.isna(y))
            )
            if not ok:
                problems.append(f"col {c} row {i}: {x!r} != {y!r}")
                break
    return problems


def main(selected: list[str]) -> int:
    import __spark_entry__ as entrymod
    from fluent_bit_filter_math_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = selected or list(qs)
    failures = 0
    results = {}
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"status": "spark_error", "err": str(e)[:300]}
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows, "
                  f"{time.time()-t0:.1f}s, no oracle)")
            results[name] = {"status": "rows_only", "rows": len(spark_pdf)}
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"status": "duckdb_error", "err": str(e)[:300]}
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            results[name] = {"status": "mismatch", "problems": problems[:3]}
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match "
                  f"({time.time()-t0:.1f}s)")
            results[name] = {"status": "ok", "rows": len(spark_pdf)}
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if not selected:
        import json

        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "CORRECTNESS_LOCAL.json"),
            "w",
        ) as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "passed": len(names) - failures,
                    "total": len(names),
                    "comparison": "dtype-exact (int/float kind+width), "
                                  "bitwise doubles, sorted rows",
                    "results": results,
                },
                f,
                indent=1,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
