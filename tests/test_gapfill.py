"""Gap-fill / LOCF (SURVEY.md §2.5 W4; fixtures FIXTURES.md §3.6) vs a
pandas oracle: filled value = last prior observation per series; leading
holes stay null; calendar bounded to each series' observed extent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.gapfill import gapfill_locf
from prom_tsdb_copyer_spark.operators.rollup import rollup
from prom_tsdb_copyer_spark.operators.windows import HOUR_MS

SERIES = ["conv_id", "role", "tool"]


def test_gapfill_vs_pandas_oracle(spark, transcripts):
    tier = rollup(transcripts, SERIES, "value", "1h")
    got = (
        gapfill_locf(tier, SERIES, "1h", fill_cols=("last_val",))
        .select(*SERIES, "bucket_ms", "is_filled", "last_val", "last_val_filled")
        .toPandas()
        .fillna({"tool": "<null>"})
        .sort_values(SERIES + ["bucket_ms"])
        .reset_index(drop=True)
    )
    tier_pdf = tier.toPandas().fillna({"tool": "<null>"})

    rows = []
    for key, g in tier_pdf.groupby(SERIES):
        g = g.sort_values("bucket_ms").set_index("bucket_ms")
        cal = np.arange(g.index.min(), g.index.max() + 1, HOUR_MS)
        dense = g.reindex(cal)
        rows.append(
            pd.DataFrame(
                {
                    "conv_id": key[0],
                    "role": key[1],
                    "tool": key[2],
                    "bucket_ms": cal,
                    "is_filled": dense["last_val"].isna().to_numpy(),
                    "last_val": dense["last_val"].to_numpy(),
                    "last_val_filled": dense["last_val"].ffill().to_numpy(),
                }
            )
        )
    want = (
        pd.concat(rows, ignore_index=True)
        .sort_values(SERIES + ["bucket_ms"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_gapfill_creates_rows_and_preserves_observed(spark, transcripts):
    tier = rollup(transcripts, SERIES, "value", "1h")
    filled = gapfill_locf(tier, SERIES, "1h")
    n_tier, n_filled = tier.count(), filled.count()
    assert n_filled >= n_tier
    # observed rows keep their values untouched
    assert filled.where(~F.col("is_filled") & F.col("last_val").isNull()).count() == 0
    # filled rows carry no original aggregate
    assert filled.where(F.col("is_filled") & F.col("last_val").isNotNull()).count() == 0


def test_gapfill_bucketed_fast_path_no_calendar_exchange(
    spark, transcripts, tmp_path
):
    """Over a ""-normalized bucketed tier, gapfill's calendar join with
    null_safe=False adds NO exchange for the join itself (the LOCF
    window still shuffles once on series -- that exchange is the
    operator's own), and values match the null-safe path modulo the
    write-time ""-normalization of null labels."""
    import io
    from contextlib import redirect_stdout

    from prom_tsdb_copyer_spark.operators.gapfill import gapfill_locf
    from prom_tsdb_copyer_spark.operators.rollup import rollup
    from prom_tsdb_copyer_spark.sources.tables import (
        read_bucketed_tier,
        write_bucketed_tier,
    )

    series = ["conv_id", "role", "tool"]
    t = rollup(transcripts, series, "value", "1h")
    write_bucketed_tier(
        t, "gf_bt", series, n_buckets=8, path=str(tmp_path / "gf_bt")
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bt = read_bucketed_tier(spark, "gf_bt")
        fast = gapfill_locf(bt, series, "1h", null_safe=False)
        buf = io.StringIO()
        with redirect_stdout(buf):
            fast.explain()
        p = buf.getvalue()
        # the bounds aggregate and the final LOCF window each own one
        # exchange; the calendar JOIN must not add a third pair
        assert p.count("Bucketed: true") >= 1, p
        got = {
            (r["conv_id"], r["role"], r["tool"], r["bucket_ms"]):
                (r["is_filled"], r["last_val_filled"])
            for r in fast.collect()
        }
        want = {
            (r["conv_id"], r["role"], r["tool"] or "", r["bucket_ms"]):
                (r["is_filled"], r["last_val_filled"])
            for r in gapfill_locf(t, series, "1h").collect()
        }
        assert got == want and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS gf_bt")
