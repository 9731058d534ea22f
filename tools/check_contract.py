"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` on DuckDB over the same parquet, then compares row count,
column names, and an order-insensitive value multiset (values normalized to
strings, columns sorted by name — mirroring the driver contract).

Usage: python tools/check_contract.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Vacuity gate (VERDICT r10 #7): a contract that returns ZERO rows at
# sf0.01 proves nothing — both sides of the oracle compare agree on the
# empty set no matter how wrong the query is (customers_without_orders
# was green-but-vacuous for three rounds before the r10 hand audit).
# Any 0-row result FAILS unless the entry is allowlisted here with a
# reason explaining why emptiness is itself the asserted behavior.
ZERO_ROW_ALLOWLIST: dict[str, str] = {}


def _norm(v) -> str:
    import datetime as dt

    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Exact repr — the driver's hash does NOT round, so neither do we:
        # local green must predict driver green (VERDICT r01 item 3).
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def main(names: list[str] | None = None) -> int:
    import __spark_entry__ as e
    from changedatacapture_reporting_spark.session import get_spark

    spark = get_spark("check_contract")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    todo = names or list(qs)
    failures = []
    for name in todo:
        sdf = qs[name](spark, SF_DIR)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        if not s_rows and name not in ZERO_ROW_ALLOWLIST:
            failures.append(name)
            print(
                f"  {name:42s} FAIL: VACUOUS — 0 rows at sf0.01 "
                "(an empty result proves nothing; allowlist with a "
                "reason if emptiness IS the asserted behavior)"
            )
            continue
        if name not in oracles:
            status = []
            status.append(f"rows-only: {len(s_rows)} rows")
            print(f"  {name:42s} OK ({'; '.join(status)})")
            continue
        # Type policy: the driver's normalization diverges on exotic result
        # types — DuckDB HUGEINT (any SUM over integers) and DECIMAL outputs
        # become float64 under pandas conversion while Spark keeps
        # int64/Decimal, so identical VALUES still hash-mismatch
        # (CORRECTNESS_r01: all 8 hash-fails had exactly such a column).
        # Forbid them on either side.
        ok = True
        status = []
        bad_spark = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if "decimal" in f.dataType.simpleString()
        ]
        if bad_spark:
            ok = False
            status.append(f"SPARK-DECIMAL-OUTPUT {bad_spark}")
        bad_duck = [
            f"{r[0]}:{r[1]}"
            for r in con.execute("DESCRIBE " + oracles[name]).fetchall()
            if "HUGEINT" in r[1] or "DECIMAL" in r[1]
        ]
        if bad_duck:
            ok = False
            status.append(f"DUCK-HUGEINT/DECIMAL-OUTPUT {bad_duck}")
        res = con.execute(oracles[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            status.append(f"COLS spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            ok = False
            status.append(f"COUNT spark={len(s_rows)} duck={len(d_rows)}")
        if ok:
            ms, md = _multiset(s_cols, s_rows), _multiset(d_cols, d_rows)
            if ms != md:
                ok = False
                only_s = list((ms - md).items())[:3]
                only_d = list((md - ms).items())[:3]
                status.append(f"VALUES spark-only={only_s} duck-only={only_d}")
        if ok:
            print(f"  {name:42s} OK ({len(s_rows)} rows)")
        else:
            failures.append(name)
            print(f"  {name:42s} FAIL: {' | '.join(status)}")
    print(f"\n{len(todo) - len(failures)}/{len(todo)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
