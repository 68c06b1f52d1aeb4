"""Contract tests for the driver-gate oracle SQL — DuckDB-only (no
Spark session), so they run in seconds.

Round-3 lesson (VERDICT r3, "What's wrong" #1): DuckDB widens integer
``sum()`` to HUGEINT (INT128).  Locally ``fetchall()`` collapses
HUGEINT and BIGINT to the same Python int, but the driver's hasher
canonicalizes INT128 differently, so three queries hash-failed for two
rounds with perfect value parity.  These tests pin the fix:

* no oracle result column may be HUGEINT / UHUGEINT / DECIMAL;
* the audit helper itself must catch a deliberately-HUGEINT oracle
  (guards against the check silently rotting);
* the fixture-precision assumption behind the milli-unit discipline
  (every ``events.value`` is exactly 2-decimal) is asserted against the
  real driver fixture, so a regenerated fixture fails HERE instead of
  at the gate (VERDICT r3, "What's wrong" #3).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import FORBIDDEN_DUCK_TYPES, type_audit  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


@pytest.fixture(scope="module")
def oracles():
    import __spark_entry__ as entry

    return entry.oracle_sql()


def test_no_forbidden_types_in_any_oracle(con, oracles):
    bad = []
    for name, sql in oracles.items():
        rel = con.sql(sql)
        for col, ty in zip(rel.columns, rel.types):
            s = str(ty).upper()
            if any(s.startswith(f) for f in FORBIDDEN_DUCK_TYPES):
                bad.append((name, col, s))
    assert bad == [], f"hash-unstable oracle column types: {bad}"


def test_audit_catches_deliberate_hugeint(con):
    """DuckDB sum(INTEGER) widens to HUGEINT — the audit must flag it."""
    rel = con.sql("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert str(rel.types[0]).upper().startswith("HUGEINT"), (
        "precondition: DuckDB no longer widens sum(int) to HUGEINT; "
        "update FORBIDDEN_DUCK_TYPES rationale"
    )
    problems = type_audit([("s", "bigint")], rel.columns, rel.types)
    assert any("HUGEINT" in p for p in problems)


def test_audit_catches_spark_duck_type_mismatch():
    class _T:
        def __init__(self, s):
            self._s = s

        def __str__(self):
            return self._s

    problems = type_audit([("v", "bigint")], ["v"], [_T("DOUBLE")])
    assert problems == ["v: spark bigint vs duckdb DOUBLE"]
    assert type_audit([("v", "bigint")], ["v"], [_T("BIGINT")]) == []


def test_fixture_values_are_two_decimal(con):
    """The milli-unit exactness argument (functions/exact.py) assumes
    events.value carries at most 2 decimals. Pin that against the real
    fixture so a driver regeneration with finer precision fails loudly."""
    # NOTE: `value * 100 != round(value * 100)` is the wrong probe —
    # 0.29 * 100 = 28.999999999999996 in binary floats. The contract is
    # "value is the nearest double to a 2-decimal literal", i.e. it
    # survives a round-trip through round(value, 2).
    n_bad = con.sql(
        "SELECT count(*) FROM events WHERE value != round(value, 2)"
    ).fetchone()[0]
    assert n_bad == 0, (
        f"{n_bad} events.value rows are not exactly 2-decimal; the "
        "milli-unit oracle discipline (functions/exact.py) no longer "
        "holds — revisit every *_mills oracle column"
    )


def test_milliunit_sums_away_from_midpoints(con):
    """The accumulated FLOAT sum of each gated group, scaled to
    milli-units, must sit far from every round-to-integer midpoint
    (x.5) — that distance is what makes round(sum*1000) identical
    across engines regardless of summation order. The exact sum is a
    multiple of 10 milli-units (2-decimal inputs), so the nearest
    midpoint is 0.5 away; assert the float error eats < 0.499 of that
    margin on the real fixture, at the finest gated grouping (1h
    buckets per series, which subsumes the coarser groupings)."""
    rows = con.sql(
        "SELECT sum(value) * 1000 FROM events GROUP BY user_id, "
        "event_type, (epoch_ms(ts) // 3600000)"
    ).fetchall()
    worst = max(abs(s - round(s)) for (s,) in rows)
    assert worst < 0.499, (
        f"float milli-unit sum within {0.5 - worst:.2e} of a rounding "
        "midpoint — milli-unit gating is no longer engine-stable"
    )


def test_fixture_line_count_within_oracle_cap(con):
    """The line_dedup oracle enumerates line indices from a fixed
    generate_series(1, 10000) table; the Spark side has no cap. Pin the
    assumption so a regenerated fixture with longer documents fails
    HERE, not as a silent gate mismatch."""
    mx = con.execute(
        "SELECT max(len(string_split(text, chr(10)))) FROM documents"
    ).fetchone()[0]
    assert mx is not None and mx <= 10_000, mx


def test_fixture_decontaminate_eval_subset_nonempty(con):
    """The decontaminate_flags gate derives its eval set as
    doc_id % 97 == 0; the query only proves something if that subset
    contains at least one doc long enough to produce a 13-gram."""
    n = con.execute(
        r"""SELECT count(*) FROM documents
            WHERE doc_id % 97 = 0
              AND len(list_filter(string_split_regex(trim(text), '\s+'),
                                  t -> t != '')) >= 13"""
    ).fetchone()[0]
    assert n >= 1, n
