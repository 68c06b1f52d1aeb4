from __future__ import annotations

import os

import pytest

from prom_tsdb_copyer_spark.datagen import gen_transcripts_df
from prom_tsdb_copyer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # one JVM serves the whole 230+-test session; at the 8g default the
    # tail-end e2e tests can die with a bare Py4JNetworkError ("Answer
    # from Java side is empty" = driver JVM OOM-killed) after hundreds
    # of cached plans/broadcasts accumulate -- seen twice on the full
    # suite while every file passes in isolation
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    """tiny scale (~50 convs) deterministic transcripts, cached."""
    df = gen_transcripts_df(spark, n_convs=50, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def transcripts_pdf(transcripts):
    return transcripts.toPandas()
