"""Label append / relabel projection (SURVEY.md §2.2 F11).

The reference upserts appended labels into each series' label set before
appending samples (/root/reference/copyer.go:99-105; flag main.go:125),
with overwrite-on-conflict and no existence check (main.go:44 help text).
Because it happens before the append, it *changes series identity* --
two formerly distinct series that collide after relabeling merge.

Spark equivalent: ``withColumn(k, lit(v))`` per appended label, applied
BEFORE the rollup groupBy, so merged identities aggregate together
exactly as the reference's appender would interleave them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_label_pairs(pairs: list[str]) -> dict[str, str]:
    """CLI-style ``k=v`` pairs -> dict (last wins, like repeated flags)."""
    out: dict[str, str] = {}
    for p in pairs:
        if "=" not in p:
            raise ValueError(f"label append must be k=v, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def label_append(df: DataFrame, labels: dict[str, str]) -> DataFrame:
    """Upsert constant labels as columns (overwrite semantics match
    ``withColumn``). New label names become new series-key columns."""
    for k, v in labels.items():
        df = df.withColumn(k, F.lit(v))
    return df


_LABEL_NAME = r"[a-zA-Z_][a-zA-Z0-9_]*"


def _parse_template(replacement: str):
    """Split a PromQL replacement template into literal chunks and $N
    capture references (``$1-x$2`` -> ["", 1, "-x", 2, ""]). ``$$``
    escapes a literal dollar. Driver-side: the template is a constant."""
    import re

    parts: list[str | int] = []
    lit = []
    i = 0
    while i < len(replacement):
        c = replacement[i]
        if c == "$" and i + 1 < len(replacement):
            nxt = replacement[i + 1]
            if nxt == "$":
                lit.append("$")
                i += 2
                continue
            m = re.match(r"\d+", replacement[i + 1:])
            if m:
                parts.append("".join(lit))
                lit = []
                parts.append(int(m.group(0)))
                i += 1 + len(m.group(0))
                continue
        lit.append(c)
        i += 1
    parts.append("".join(lit))
    return parts


def label_replace(
    df: DataFrame,
    dst_label: str,
    replacement: str,
    src_label: str,
    regex: str,
) -> DataFrame:
    """PromQL ``label_replace(v, dst, replacement, src, regex)``: match
    `regex` against the ENTIRE value of `src_label` (PromQL anchors it
    as ``^(?:regex)$``); on match, set `dst_label` to the template with
    $1..$N capture references expanded; on no match the row keeps its
    old `dst_label`. An absent src label is the empty string (the
    matcher convention, matchers.py); an expansion to "" REMOVES the
    label (stored as null, which the engine treats as "" ≡ absent).

    Pure codegen: one rlike + fixed concat of regexp_extract calls (the
    template is parsed driver-side), no UDF, no shuffle. Applied before
    a rollup it changes series identity exactly like label_append --
    PromQL applies it per-sample too. Portable regex subset (no
    lookaround, the scrub_pii discipline) keeps the law DuckDB-twinnable
    via regexp_full_match + backref replace."""
    import re as _re

    if not _re.fullmatch(_LABEL_NAME, dst_label):
        raise ValueError(f"invalid destination label name {dst_label!r}")
    # surface a bad pattern driver-side, like PromQL; the group count
    # bounds template references below
    n_groups = _re.compile(regex).groups
    anchored = f"^(?:{regex})$"
    src = (
        F.coalesce(F.col(src_label).cast("string"), F.lit(""))
        if src_label in df.columns
        else F.lit("")
    )
    chunks = []
    for part in _parse_template(replacement):
        if isinstance(part, int):
            if part > n_groups:
                # ADVICE r8 #5: Go's regexp.Expand expands a reference
                # beyond the pattern's group count to the EMPTY string;
                # Spark's regexp_extract would instead fail at execution
                # time with an invalid-group error. Map it to "" (a
                # no-op in the concat) driver-side.
                continue
            # group 0 is the whole match; (?:...) keeps user group
            # numbers stable inside the anchor
            chunks.append(F.regexp_extract(src, anchored, part))
        elif part:
            chunks.append(F.lit(part))
    expanded = F.concat(*chunks) if chunks else F.lit("")
    old = (
        F.col(dst_label).cast("string")
        if dst_label in df.columns
        else F.lit(None).cast("string")
    )
    new = F.when(
        src.rlike(anchored),
        F.when(expanded == "", F.lit(None).cast("string")).otherwise(
            expanded
        ),
    ).otherwise(old)
    return df.withColumn(dst_label, new)


def label_join(
    df: DataFrame,
    dst_label: str,
    separator: str,
    src_labels: list[str],
) -> DataFrame:
    """PromQL ``label_join(v, dst, sep, src...)``: `dst_label` becomes
    the src label values joined by `separator`, absent labels joining
    as "" (each src is coalesced first -- concat_ws would otherwise
    SKIP a null instead of keeping its empty slot, silently changing
    arity). Pure codegen, no shuffle."""
    import re as _re

    if not _re.fullmatch(_LABEL_NAME, dst_label):
        raise ValueError(f"invalid destination label name {dst_label!r}")
    srcs = [
        F.coalesce(F.col(c).cast("string"), F.lit(""))
        if c in df.columns
        else F.lit("")
        for c in src_labels
    ]
    joined = F.concat_ws(separator, *srcs)
    return df.withColumn(
        dst_label,
        F.when(joined == "", F.lit(None).cast("string")).otherwise(joined),
    )
