"""Optics-style result rules — the config surface of the reference's
optics DSL scoped to this engine's query surface.

Reference (/root/reference/crates/core/src/query/optic.rs +
crates/optics): user rules carry a Matching (compiled to a tantivy
query) and an Action — Boost(f) / Downrank(f) / Discard. At ranking
time every matching rule accumulates into per-doc boost/downrank sums
and the blended score is multiplied by
``1/(1 + downrank - boost)`` when downrank > boost else
``boost - downrank + 1`` (computer/mod.rs:471-497, applied in
initial.rs:87-88); Discard rules join the boolean query as exclusions
(optic.rs:62-77).

Here a rule's `matches` is a query fragment over the same surface the
engine indexes — attribute filters (``lang:de``, ``source:src1``,
``role:user`` — the site:/domain matcher analog) and/or plain terms
(the content matcher analog). A doc matches when ALL clauses match.
"""

from __future__ import annotations

from dataclasses import dataclass

from .parser import ParsedQuery, parse_query

ACTIONS = ("boost", "downrank", "discard")


@dataclass(frozen=True)
class Optic:
    """A rule set, optionally with DiscardNonMatching semantics
    (reference: optic.rs:56-70 — when set, a Must clause is added that
    is the UNION of all non-discard rules' matchers, so results must
    match at least one rule; discard rules stay exclusions)."""

    rules: tuple
    discard_non_matching: bool = False


@dataclass(frozen=True)
class Rule:
    """One optic rule: `matches` query fragment + action.

    action="boost": factor accumulates into the doc's boost sum.
    action="downrank": factor accumulates into the downrank sum.
    action="discard": matching docs are excluded from results entirely.
    """

    matches: str
    action: str = "boost"
    factor: float = 1.0

    def parsed(self) -> ParsedQuery:
        pq = parse_query(self.matches)
        if pq.negative:
            raise ValueError(
                "optic rule matchers are positive-only; express "
                "exclusion with action='discard'")
        for c in pq.positive:
            if c.kind == "phrase":
                raise ValueError(
                    "optic rule matchers support terms and attribute "
                    "filters (phrase matchers not implemented)")
        return pq


def compile_rules(rules) -> tuple[list[tuple], list[tuple]]:
    """-> (boost_rules, discard_groups) where boost_rules =
    [(signed_factor, [term, ...]), ...] (downrank carries the negative
    sign, optic.rs:153-158) and discard_groups = [[term, ...], ...]
    (MustNot-group shape: excluded when all terms match)."""
    boosts: list[tuple] = []
    discards: list[tuple] = []
    for r in rules:
        if r.action not in ACTIONS:
            raise ValueError(f"unknown optic action {r.action!r}")
        terms = [t for c in r.parsed().positive for t in c.tokens]
        if r.action == "discard":
            discards.append(terms)
        else:
            sign = 1.0 if r.action == "boost" else -1.0
            boosts.append((sign * float(r.factor), terms))
    return boosts, discards
