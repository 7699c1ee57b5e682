#!/usr/bin/env python
"""Self-check harness mirroring the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() side-by-side at
sf=0.01, compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0.0"  # fold -0.0 only; otherwise exact (driver hashes exact values)
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


# DuckDB logical types whose pandas/Arrow rendering differs from the python
# ints Spark emits — the driver converts through pandas, so ANY of these in an
# oracle output is a guaranteed hash mismatch even when values are identical
# (round-1 lesson: SUM(<integer>) -> HUGEINT -> '2014.0' != '2014').
_BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
              "UINTEGER", "UBIGINT"}


def _duck_class(t: str) -> str:
    t = str(t).upper()
    if t in _INT_TYPES:
        return "int"
    if t in ("DOUBLE", "FLOAT"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    return t.lower()


def _spark_class(t: str) -> str:
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t == "boolean":
        return "bool"
    if t == "string":
        return "str"
    return t


def type_problems(sdtypes, ocols, otypes) -> list[str]:
    """Per-column type-class comparison (exact, like the driver's hash)."""
    out = []
    omap = {c: _duck_class(t) for c, t in zip(ocols, otypes)}
    oraw = {c: str(t).upper() for c, t in zip(ocols, otypes)}
    for c, t in sdtypes:
        ot = oraw.get(c, "")
        if any(b in ot for b in _BAD_ORACLE_TYPES):
            out.append(f"oracle col '{c}' is {ot} (pandas-renders != spark int; CAST it)")
        elif c in omap and omap[c] != _spark_class(t):
            out.append(f"col '{c}' type class spark={_spark_class(t)} duckdb={omap[c]}")
    return out


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from docling_nlp_api_spark.session import get_spark

    only = set(sys.argv[1:])
    # sweep knobs (round-5 hash-invariance audit): vary parallelism /
    # shuffle fan-out / input split size and re-run — every oracle hash
    # must be identical because DuckDB's side is fixed, so a PASS at each
    # setting proves the Spark result is partition-layout-invariant
    cores = int(os.environ.get("SPARK_GRAFT_CHECK_CORES", "16"))
    shuffle = int(os.environ.get("SPARK_GRAFT_CHECK_SHUFFLE", "16"))
    split = os.environ.get("SPARK_GRAFT_CHECK_SPLIT_BYTES")
    extra = {"spark.sql.files.maxPartitionBytes": split} if split else None
    spark = get_spark(
        "check_correctness", cores=cores, shuffle_partitions=shuffle, extra_conf=extra
    )
    unknown = only - set(entrymod.queries())
    if unknown:
        # a typo'd filter must not produce a green "0 pass, 0 fail" run
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        spark.stop()
        return 2
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle; rows-only) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            problems.extend(type_problems(sdf.dtypes, ocols, otypes))
        if not problems:
            cs, co = canon(srows, scols), canon(orows, ocols)
            if cs != co:
                for a, b in zip(cs, co):
                    if a != b:
                        problems.append(f"first value diff: spark={a} duckdb={b}")
                        break
                else:
                    problems.append("value diff at tail")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
