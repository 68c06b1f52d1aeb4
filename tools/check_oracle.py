"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares the
result against ``oracle_sql()`` via DuckDB: row count, sorted column
names, and order-insensitive exact value equality (columns sorted by
name, rows sorted, floats compared bit-wise after both sides' declared
rounding). Usage: python tools/check_oracle.py [names...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# r3 lesson (VERDICT r3 "What's wrong" #1): three oracles emitted DuckDB
# HUGEINT (INT128) from integer sum(); values matched locally because
# fetchall() collapses HUGEINT and BIGINT to Python int, but the driver's
# hasher canonicalizes INT128 differently -> two rounds of hash-fails the
# value comparison could never see. So the local gate now audits TYPES:
# no oracle column may be HUGEINT/UHUGEINT/DECIMAL, and each DuckDB
# column type must map to the Spark column's.
FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")
_SPARK2DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP WITH TIME ZONE", "TIMESTAMPTZ"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}


def type_audit(s_dtypes, d_cols, d_types):
    """Return a list of per-column type problems (empty == clean)."""
    problems = []
    duck = {c: str(t).upper() for c, t in zip(d_cols, d_types)}
    for col, dt in duck.items():
        if any(dt.startswith(bad) for bad in FORBIDDEN_DUCK_TYPES):
            problems.append(f"{col}: oracle type {dt} is forbidden "
                            f"(hash-unstable at the driver) -- CAST it")
    for col, st in s_dtypes:
        dt = duck.get(col)
        if dt is None:
            continue  # column-name mismatch reported separately
        want = _SPARK2DUCK.get(st)
        if want is not None and dt not in want:
            problems.append(f"{col}: spark {st} vs duckdb {dt}")
    return problems


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(v)
                if math.isnan(v):
                    v = "NaN"
            if hasattr(v, "item"):
                v = v.item()
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main(names: list[str]) -> int:
    import __spark_entry__ as entry

    from prom_tsdb_copyer_spark.session import get_spark

    cores = int(os.environ.get("CHECK_CORES", "8"))
    spark = get_spark(app_name="check_oracle", cores=cores,
                      shuffle_partitions=cores)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    targets = names or list(qs)
    failures = 0
    for name in targets:
        try:
            sdf = qs[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name}: rows-only ({len(s_rows)} rows, no oracle)")
                continue
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = list(rel.types)
            d_rows = rel.fetchall()
            type_problems = type_audit(sdf.dtypes, d_cols, d_types)
            ok_cols = sorted(s_cols) == sorted(d_cols)
            ok_count = len(s_rows) == len(d_rows)
            sc, dc = canon(s_rows, s_cols), canon(d_rows, d_cols)
            ok_vals = sc == dc
            ok_types = not type_problems
            status = ("OK" if (ok_cols and ok_count and ok_vals and ok_types)
                      else "FAIL")
            if status == "FAIL":
                failures += 1
                print(f"  {name}: FAIL cols={ok_cols} count={ok_count} "
                      f"({len(s_rows)} vs {len(d_rows)}) vals={ok_vals} "
                      f"types={ok_types}")
                for p in type_problems:
                    print(f"    type: {p}")
                if not ok_cols:
                    print(f"    spark: {sorted(s_cols)}\n    duck:  {sorted(d_cols)}")
                if ok_cols and ok_count and not ok_vals:
                    bad = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                    for a, b in bad:
                        print(f"    spark {a}\n    duck  {b}")
            else:
                print(f"  {name}: OK ({len(s_rows)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"  {name}: ERROR {type(e).__name__}: {e}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
