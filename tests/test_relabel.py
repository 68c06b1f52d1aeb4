"""Relabel/append semantics (FIXTURES.md §3.2; reference copyer.go:99-105,
upsert per main.go:44): appended labels overwrite, and identity changes
propagate to grouping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.operators.relabel import label_append, parse_label_pairs
from prom_tsdb_copyer_spark.operators.rollup import rollup
from prom_tsdb_copyer_spark.plans.copy_job import CopyJob, run_rollups


def test_append_new_label_on_every_series(spark, transcripts):
    out = label_append(transcripts, {"storage": "persistent"})
    assert out.where(F.col("storage") != "persistent").count() == 0
    t = rollup(out, ["conv_id", "role", "tool", "storage"], "value", "1d")
    assert t.where(F.col("storage") != "persistent").count() == 0


def test_append_overwrites_existing_key(spark, transcripts):
    """Upsert semantics: no existence check, existing label replaced."""
    out = label_append(transcripts, {"role": "merged"})
    assert out.select("role").distinct().count() == 1


def test_merge_changes_grouping_identity(spark, transcripts):
    """Overwriting `role` merges formerly-distinct series; per-bucket
    counts must equal the sum over the original role split."""
    series = ["conv_id", "role", "tool"]
    before = rollup(transcripts, series, "value", "1d")
    merged = rollup(
        label_append(transcripts, {"role": "all"}), series, "value", "1d"
    )
    sum_before = (
        before.groupBy("conv_id", "bucket_ms").agg(F.sum("cnt").alias("n"))
    )
    sum_after = merged.groupBy("conv_id", "bucket_ms").agg(F.sum("cnt").alias("n"))
    assert sum_before.exceptAll(sum_after).count() == 0
    assert sum_after.exceptAll(sum_before).count() == 0
    # distinct (role, tool) collapse: merged has exactly one role value
    assert merged.select("role").distinct().collect()[0][0] == "all"


def test_parse_label_pairs():
    assert parse_label_pairs(["a=1", "b=x=y", "a=2"]) == {"a": "2", "b": "x=y"}


def test_job_level_append(spark, transcripts):
    tiers = run_rollups(transcripts, CopyJob(label_append=("env=prod",)))
    assert "env" in tiers["1m"].columns
    assert tiers["1m"].where(F.col("env") != "prod").count() == 0


def test_label_replace_template_parse():
    from prom_tsdb_copyer_spark.operators.relabel import _parse_template

    assert _parse_template("$1-x$2") == ["", 1, "-x", 2, ""]
    assert _parse_template("static") == ["static"]
    assert _parse_template("$$1") == ["$1"]
    assert _parse_template("a$10b") == ["a", 10, "b"]
    assert _parse_template("") == [""]


def test_label_replace_and_join_vs_duckdb(spark, transcripts,
                                          transcripts_pdf):
    """PromQL label_replace/label_join laws vs an independent DuckDB
    recompute (regexp_full_match + backref regexp_replace): capture
    expansion on match, old-dst retention on no-match, absent-src ==
    "", empty expansion removes the label (null ≡ "" per the matcher
    convention), and join keeps empty slots."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.relabel import (
        label_join,
        label_replace,
    )

    # tool values in the fixture include nulls (absent label): regex
    # captures the suffix of tool names starting 's'; everything else
    # (incl. absent == "") keeps its old dst -- which starts absent
    out = label_replace(transcripts, "env", "x-$1", "tool", "s(.*)")
    out = label_join(out, "sid", "/", ["role", "env"])
    got = [
        (r["conv_id"], r["turn_idx"], r["env"], r["sid"])
        for r in out.select("conv_id", "turn_idx", "env", "sid").collect()
    ]
    con = duckdb.connect()
    con.register("transcripts", transcripts_pdf)
    want = {
        (c, int(t)): (e, s)
        for c, t, e, s in con.sql(r"""
        WITH rep AS (
          SELECT conv_id, turn_idx,
                 CASE WHEN regexp_full_match(coalesce(tool, ''), 's(.*)')
                      THEN nullif(regexp_replace(
                             coalesce(tool, ''), '^(?:s(.*))$', 'x-\1'),
                           '')
                      ELSE NULL END AS env
          FROM transcripts),
        j AS (
          SELECT t.conv_id, t.turn_idx, rep.env,
                 nullif(concat_ws('/', coalesce(t.role, ''),
                        coalesce(rep.env, '')), '') AS sid
          FROM transcripts t
          JOIN rep ON rep.conv_id = t.conv_id
                  AND rep.turn_idx = t.turn_idx)
        SELECT * FROM j
        """).fetchall()
    }
    assert got and all(
        (e, s) == want[(c, int(t))] for c, t, e, s in got
    )
    envs = {e for _, _, e, _ in got}
    assert None in envs and any(
        e and e.startswith("x-") for e in envs
    )  # both branches exercised

    # no-match keeps the OLD dst value (not null): overwrite role where
    # tool matches, keep role otherwise
    kept = label_replace(transcripts, "role", "m-$1", "tool", "s(.*)")
    rows = kept.select("role", "tool").distinct().collect()
    assert any(
        r["role"].startswith("m-") for r in rows if r["role"]
    )
    assert any(
        not (r["role"] or "").startswith("m-") for r in rows
    )

    # validation: bad dst name / bad regex raise driver-side
    import pytest

    with pytest.raises(ValueError):
        label_replace(transcripts, "0bad", "$1", "tool", ".*")
    with pytest.raises(Exception):
        label_replace(transcripts, "env", "$1", "tool", "(unclosed")
    with pytest.raises(ValueError):
        label_join(transcripts, "bad name", "/", ["role"])


def test_label_replace_out_of_range_group_expands_empty(spark):
    """ADVICE r8 #5: a $N beyond the pattern's group count expands to
    "" (Go regexp.Expand), instead of failing inside regexp_extract."""
    from prom_tsdb_copyer_spark.operators.relabel import label_replace

    df = spark.createDataFrame([("abc",)], "src string")
    out = label_replace(df, "dst", "$2-x$1", "src", "(a)b.")
    row = out.collect()[0]
    assert row["dst"] == "-xa"
    # template that is ONLY an out-of-range group -> expands to "" ->
    # label removed (stored null, the "" ≡ absent convention)
    out2 = label_replace(df, "dst", "$2", "src", "(a)b.")
    assert out2.collect()[0]["dst"] is None
