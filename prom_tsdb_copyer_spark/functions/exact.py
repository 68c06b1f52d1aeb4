"""Exact integer encodings for gated float aggregates.

The driver's correctness gate hashes result values after both engines'
declared rounding. Two rounds of evidence (CORRECTNESS_r01/r02) showed
that DOUBLE columns derived from *accumulated* sums can hash-differently
across engines even when every local comparison is exact: Spark's
``F.round`` rounds the shortest-decimal representation of the double
(``BigDecimal.valueOf`` + HALF_UP) while DuckDB rounds the exact binary
value, and the driver environment's formatting/path cannot be reproduced
locally. The fix is to change the *type*, not the rounding discipline:

    sum_mills = CAST(round(sum(value) * 1000) AS BIGINT)

For inputs with exactly two decimals (a fixture property PINNED by
``tests/test_oracle_contract.py::test_fixture_values_are_two_decimal``,
not assumed), the true mathematical sum*1000 is an integer multiple of
10, so the nearest round-to-integer midpoint is 0.5 milli-units away
(5e-4 in value units). The float accumulation error must stay below
that margin: a worst-case *sequential* bound (~n * ulp * sum|x|) would
exceed 5e-4 somewhere past ~1e7 same-group rows, but both engines use
blocked/partial accumulation (Spark partial-agg per partition, DuckDB
vectorized chunks), whose error grows ~log(n)-ish, and gated groups are
time-bucketed so per-group n is bounded by the bucket width regardless
of total scale. The live margin on the real fixture is asserted by
``test_oracle_contract.py::test_milliunit_sums_away_from_midpoints``
and the order-invariance by ``test_exact.py``. Every engine, version,
and summation order then rounds to the SAME integer, and integers hash
identically everywhere. Quotients (averages) are not emitted at all:
consumers derive them from the exact ``(sum_mills, cnt)`` pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scale factor: 2-decimal fixture values -> milli-units are exact ints
MILLI = 1000


def milli_units(col: Column) -> Column:
    """Accumulated float sum of 2-decimal inputs -> exact BIGINT
    milli-units (see module docstring for why this is hash-stable where
    ``round(sum, 3)`` is not)."""
    return F.round(col * MILLI, 0).cast("long")


#: the DuckDB twin of ``milli_units`` (string-formatted into oracles)
def milli_units_sql(expr: str) -> str:
    return f"CAST(round(({expr}) * {MILLI}) AS BIGINT)"
