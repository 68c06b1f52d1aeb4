"""Prometheus-style label matcher strings -> Spark Column predicates.

Re-expresses the reference's matcher parsing and filtering semantics
(reference: /root/reference/main.go:82-111 parse, main.go:144-158 defaults,
applied at copyer.go:91) as Catalyst Column expressions so label filters
participate in predicate pushdown / partition pruning.

Bug-compatible quirks preserved from the reference parser:
  * Operators are probed in the fixed order ``!=``, ``=~``, ``!~``, ``=``
    with a substring test, first hit wins (main.go:84-100): ``a=~b!=c``
    parses as op ``!=`` with name ``a=~b``.
  * The value may itself contain the operator: the Go code splits on the
    op and rejoins the tail with the op (main.go:104-110), equivalent to a
    single split -- ``text_hash=a=b`` -> name ``text_hash``, value ``a=b``.
  * A bare string without any operator is shorthand for
    ``__name__=<s>`` (main.go:96-99).
  * With no matchers at all the default is the match-all predicate
    ``__name__!=""`` (main.go:153-157).

Prometheus matcher semantics preserved:
  * Regexes are fully anchored: ``v`` becomes ``^(?:v)$`` (RE2 semantics;
    we execute with Java regex, identical for the anchored common subset --
    divergences like backreferences, which RE2 rejects, are documented
    rather than emulated).
  * An absent/null label is equivalent to the empty string, so ``k!=v``
    and ``k!~v`` match series missing ``k``, and ``k=""`` matches them too.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

METRIC_LABEL = "__name__"

_SEPARATORS = ("!=", "=~", "!~", "=")  # probe order is load-bearing (main.go:84-100)


class MatchOp(str, Enum):
    EQ = "="
    NEQ = "!="
    RE = "=~"
    NRE = "!~"


@dataclass(frozen=True)
class Matcher:
    name: str
    op: MatchOp
    value: str

    def anchored(self) -> str:
        return f"^(?:{self.value})$"


def parse_matcher(s: str) -> Matcher:
    """Parse one matcher string, replicating the reference's quirks."""
    for sep in _SEPARATORS:
        if sep in s:
            name, value = s.split(sep, 1)
            return Matcher(name=name, op=MatchOp(sep), value=value)
    # bare string -> __name__ equality shorthand (main.go:96-99)
    return Matcher(name=METRIC_LABEL, op=MatchOp.EQ, value=s)


def parse_matchers(strings: list[str] | None) -> list[Matcher]:
    """Parse a matcher list; empty/None -> default match-all (main.go:153-157)."""
    if not strings:
        return [Matcher(name=METRIC_LABEL, op=MatchOp.NEQ, value="")]
    return [parse_matcher(s) for s in strings]


def matcher_predicate(m: Matcher, labels: dict[str, Column]) -> Column:
    """One matcher -> boolean Column over a label-name -> Column mapping.

    ``labels`` maps label names to expressions (e.g. ``{"conv_id":
    F.col("conv_id"), "__name__": F.lit("turns")}``). A label absent from
    the mapping, or null-valued, is the empty string (Prometheus
    semantics), so negative matchers match rows missing the label.
    """
    value = F.coalesce(labels[m.name], F.lit("")) if m.name in labels else F.lit("")
    if m.op is MatchOp.EQ:
        return value == F.lit(m.value)
    if m.op is MatchOp.NEQ:
        return value != F.lit(m.value)
    if m.op is MatchOp.RE:
        return value.rlike(m.anchored())
    return ~value.rlike(m.anchored())


def matchers_predicate(
    matchers: list[Matcher] | list[str] | None, labels: dict[str, Column]
) -> Column:
    """Conjunction of matchers (reference passes them variadically to
    Select, all must hold -- main.go:144-152, copyer.go:91)."""
    parsed = [parse_matcher(m) if isinstance(m, str) else m for m in (matchers or [])]
    if not parsed:
        parsed = parse_matchers(None)
    return reduce(Column.__and__, (matcher_predicate(m, labels) for m in parsed))


def transcript_labels(metric_name: str = "turns") -> dict[str, Column]:
    """Label mapping for the canonical transcripts schema: series key is
    (conv_id, role, tool) with a constant metric name (SURVEY.md §1.1)."""
    return {
        METRIC_LABEL: F.lit(metric_name),
        "conv_id": F.col("conv_id"),
        "role": F.col("role"),
        "tool": F.col("tool"),
    }
