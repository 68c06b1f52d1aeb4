"""Matcher parser + predicate semantics (SURVEY.md §2.2 F1-F9;
fixtures FIXTURES.md §3.1). Oracle: pandas recompute with Python `re`."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from prom_tsdb_copyer_spark.matchers import (
    MatchOp,
    Matcher,
    matchers_predicate,
    parse_matcher,
    parse_matchers,
    transcript_labels,
)

PARSE_CASES = [
    # (input, name, op, value)
    ("role=assistant", "role", MatchOp.EQ, "assistant"),
    ("role!=tool", "role", MatchOp.NEQ, "tool"),
    ("conv_id=~conv-000.*", "conv_id", MatchOp.RE, "conv-000.*"),
    ("tool!~(search|db)", "tool", MatchOp.NRE, "(search|db)"),
    # bare string -> __name__ shorthand (main.go:96-99)
    ("turns", "__name__", MatchOp.EQ, "turns"),
    # value containing the separator: split-once rejoin (main.go:104-110)
    ("text_hash=a=b", "text_hash", MatchOp.EQ, "a=b"),
    # precedence quirk: != probed before =~ (main.go:84-100)
    ("a=~b!=c", "a=~b", MatchOp.NEQ, "c"),
    # != probed before = even when = comes first in the string
    ("a=b!=c", "a=b", MatchOp.NEQ, "c"),
]


@pytest.mark.parametrize("s,name,op,value", PARSE_CASES)
def test_parse(s, name, op, value):
    m = parse_matcher(s)
    assert (m.name, m.op, m.value) == (name, op, value)


def test_default_match_all():
    ms = parse_matchers(None)
    assert ms == [Matcher("__name__", MatchOp.NEQ, "")]
    assert parse_matchers([]) == ms


def _oracle(pdf, matchers):
    """Pandas reimplementation of Prometheus matcher semantics."""
    keep = pdf.assign(__name__="turns")
    for s in matchers or ["__name__!="]:
        m = parse_matcher(s)
        col = (
            keep[m.name].fillna("")
            if m.name in keep.columns
            else keep["conv_id"].map(lambda _: "")
        )
        if m.op is MatchOp.EQ:
            mask = col == m.value
        elif m.op is MatchOp.NEQ:
            mask = col != m.value
        elif m.op is MatchOp.RE:
            mask = col.map(lambda v: re.fullmatch(f"(?:{m.value})", v) is not None)
        else:
            mask = col.map(lambda v: re.fullmatch(f"(?:{m.value})", v) is None)
        keep = keep[mask]
    return keep.drop(columns="__name__")


FILTER_CASES = [
    ["role=assistant"],
    ["role!=tool"],
    ["conv_id=~conv-000.*"],
    ["tool!~(search|db)"],  # null tool ≡ "" -> matches (negative matcher)
    ["tool=search"],
    ["tool="],  # empty value matches absent label
    ["turns"],  # bare metric name
    [],  # default __name__!=""
    ["role=~assist"],  # anchored: matches nothing
    ["role=~assist.*"],
    ["role=~(user|tool)", "conv_id!~conv-0000000[0-4]"],
    ["nosuchlabel!=x"],  # absent label ≡ "" -> all rows match
    ["nosuchlabel=x"],  # none match
]


@pytest.mark.parametrize("matchers", FILTER_CASES, ids=[str(c) for c in FILTER_CASES])
def test_filter_vs_oracle(spark, transcripts, transcripts_pdf, matchers):
    got = (
        transcripts.where(matchers_predicate(matchers or None, transcript_labels()))
        .count()
    )
    want = len(_oracle(transcripts_pdf, matchers))
    assert got == want


def test_anchoring_excludes_partial(spark, transcripts):
    labels = transcript_labels()
    n_partial = transcripts.where(
        matchers_predicate(["role=~assist"], labels)
    ).count()
    n_full = transcripts.where(
        matchers_predicate(["role=~assistant"], labels)
    ).count()
    assert n_partial == 0 and n_full > 0
