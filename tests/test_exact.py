"""Property tests for the exact milli-unit discipline
(functions/exact.py) -- the round-3 fix for the driver-gate hash
failures. The claim: for inputs with exactly two decimals, the
milli-unit integer is invariant under ANY summation order and any
engine's rounding convention, because the accumulated float error
(~ULP) leaves sum*1000 ~5 away from every rounding midpoint.
"""

from __future__ import annotations

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

# python-side model of both engines' computation: any float summation
# order, then round-half-anything to integer milli-units
TWO_DEC = st.integers(min_value=-10_000_00, max_value=10_000_00).map(
    lambda c: c / 100.0
)


@settings(max_examples=300, deadline=None)
@given(st.lists(TWO_DEC, min_size=1, max_size=400), st.randoms())
def test_milliunit_sum_order_invariant(values, rnd):
    """Any two permutations (and a pairwise-tree association) of the
    float sum round to the SAME milli-unit integer."""
    a = list(values)
    b = list(values)
    rnd.shuffle(b)

    def seq_sum(xs):
        s = 0.0
        for x in xs:
            s += x
        return s

    def tree_sum(xs):
        xs = list(xs)
        while len(xs) > 1:
            xs = [xs[i] + xs[i + 1] if i + 1 < len(xs) else xs[i]
                  for i in range(0, len(xs), 2)]
        return xs[0]

    mills = {round(seq_sum(a) * 1000), round(seq_sum(b) * 1000),
             round(tree_sum(a) * 1000)}
    assert len(mills) == 1
    # and the value is the true exact sum in milli-units
    true_mills = sum(round(v * 100) for v in values) * 10
    assert mills == {true_mills}
    # distance from the nearest rounding midpoint stays macroscopic
    # (the structural reason ANY rounding convention agrees)
    frac = abs(seq_sum(a) * 1000 - true_mills)
    assert frac < 0.4  # midpoint is at 0.5


def test_milliunit_spark_matches_python(spark):
    """Spark's milli_units over a shuffled aggregation equals the exact
    python integer for 2-decimal inputs."""
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.functions.exact import milli_units

    rnd = random.Random(7)
    rows = [(i % 13, round(rnd.uniform(-100, 100), 2)) for i in range(20_000)]
    df = spark.createDataFrame(rows, "k int, v double").repartition(16)
    got = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(milli_units(F.sum("v")).alias("m")).collect()
    }
    want: dict[int, int] = {}
    for k, v in rows:
        want[k] = want.get(k, 0) + round(v * 100) * 10
    assert got == want
    assert all(isinstance(v, int) and not math.isnan(v) for v in got.values())


def test_milliunit_large_single_group(spark):
    """ADVICE r3: pin the real margin at large n. One group, 10^6
    shuffled 2-decimal rows across many partitions — the blocked
    (partial-agg) accumulation must stay well inside the 0.5-milli-unit
    midpoint margin, and the rounded integer must equal the exact sum."""
    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.functions.exact import milli_units

    n = 1_000_000
    # deterministic pseudo-random 2-decimal values in [-100, 100],
    # generated Spark-side (no 10^6-row driver upload)
    df = (
        spark.range(n)
        .withColumn("v", F.round((F.xxhash64("id") % 20001) / 100.0 - 100.0, 2))
        .repartition(32)
    )
    got = df.agg(milli_units(F.sum("v")).alias("m")).collect()[0]["m"]
    # exact integer reference: cents via the same hash, summed as longs
    want = (
        df.agg(
            F.sum(F.round(F.col("v") * 100, 0).cast("long")).alias("c")
        ).collect()[0]["c"]
        * 10
    )
    assert got == want
    # and the float sum's midpoint distance stays macroscopic
    s = df.agg(F.sum("v")).collect()[0][0] * 1000
    assert abs(s - round(s)) < 0.4
