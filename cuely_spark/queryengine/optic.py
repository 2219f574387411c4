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

A rule's `matches` is a query fragment over the same surface the
engine indexes — attribute filters (``lang:de``, ``source:src1``,
``role:user`` — the site:/domain matcher analog) and/or plain terms
(the content matcher analog). A doc matches when ALL clauses match.

A rule's `pattern` is a TOKEN PATTERN (the reference's PatternQuery,
crates/core/src/query/pattern_query/scorer.rs NormalPatternScorer;
syntax crates/optics/src/lib.rs:225-297 PatternToken lexer):

- plain tokens must appear IN ORDER, each adjacent to the previous
  (the scorer's default gap slop of 1, scorer.rs:282-300);
- ``*`` (wildcard) allows any gap before the next token
  (scorer.rs:302-304 sets slop = u32::MAX for the next step);
- a leading ``|`` anchors the first token to document start
  (scorer.rs:305-311: first position of the first term must be 0);
- a trailing ``|`` anchors the last token to document end
  (scorer.rs:320-333: last position of the last term must equal
  num_tokens - 1); a mid-pattern ``|`` is a no-op (scorer.rs:333).

``matches`` and ``pattern`` may be combined in one rule (both must
match).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..tokenizer import tokenize
from .parser import ParsedQuery, parse_query

ACTIONS = ("boost", "downrank", "discard")

#: gap slop for `*` — fits the encoded-position window guarantee
#: (kernel.pattern_mask) while behaving as "any gap" like the
#: reference's u32::MAX (scorer.rs:302-304)
WILDCARD_SLOP = (1 << 31) - 1


@dataclass(frozen=True)
class PatternMatcher:
    """Compiled token pattern: terms in order, per-gap slops
    (slops[i] = max allowed gap between terms[i] and terms[i+1];
    1 = adjacent, WILDCARD_SLOP = any), plus start/end anchors."""

    terms: tuple[str, ...]
    slops: tuple[int, ...]
    anchor_start: bool = False
    anchor_end: bool = False


def parse_pattern(s: str) -> PatternMatcher:
    """Lex a pattern string into a PatternMatcher. ``|`` and ``*`` are
    standalone tokens even when glued to words (the reference lexer
    pushes the pending raw part on seeing either, lib.rs:236-269); raw
    parts run through the document tokenizer and their sub-tokens chain
    with adjacency (gap 1)."""
    parts: list[str] = []
    cur = ""
    for ch in s:
        if ch in "|*":
            if cur.strip():
                parts.append(cur.strip())
            cur = ""
            parts.append(ch)
        elif ch.isspace():
            if cur.strip():
                parts.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur.strip())

    anchor_start = bool(parts) and parts[0] == "|"
    anchor_end = len(parts) > 1 and parts[-1] == "|"
    terms: list[str] = []
    slops: list[int] = []
    next_slop = 1
    for p in parts:
        if p == "|":
            continue  # anchors handled above; mid-pattern = no-op
        if p == "*":
            next_slop = WILDCARD_SLOP
            continue
        for t in tokenize(p):
            if terms:
                slops.append(next_slop)
            terms.append(t)
            next_slop = 1
    if not terms:
        raise ValueError(f"pattern {s!r} has no tokens")
    return PatternMatcher(tuple(terms), tuple(slops),
                          anchor_start, anchor_end)


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
    """One optic rule: matcher + action.

    matches: query fragment — ALL terms/attribute-filters must match.
    pattern: token pattern (see module docstring). At least one of the
    two must be given; when both are, both must match.
    action="boost": factor accumulates into the doc's boost sum.
    action="downrank": factor accumulates into the downrank sum.
    action="discard": matching docs are excluded from results entirely.
    """

    matches: str | None = None
    action: str = "boost"
    factor: float = 1.0
    pattern: str | None = None

    def parsed(self) -> ParsedQuery | None:
        if self.matches is None:
            return None
        pq = parse_query(self.matches)
        if pq.negative:
            raise ValueError(
                "optic rule matchers are positive-only; express "
                "exclusion with action='discard'")
        for c in pq.positive:
            if c.kind == "phrase":
                raise ValueError(
                    "use pattern= for positional matchers (a quoted "
                    "phrase 'a b' is the pattern 'a b')")
        return pq


def matcher_terms(matcher) -> list[str]:
    """Index terms a compiled matcher needs."""
    kind, v = matcher
    if kind == "all":
        return list(v)
    return list(v.terms)


def compile_rules(rules) -> tuple[list[tuple], list[tuple]]:
    """-> (boost_rules, discard_matchers).

    boost_rules = [(signed_factor, matcher), ...] (downrank carries the
    negative sign, optic.rs:153-158); discard_matchers = [matcher, ...].
    A matcher is ("all", (term, ...)) — every term must match — or
    ("pat", PatternMatcher). A rule combining matches= and pattern=
    compiles to ("and", (matcher, matcher)).
    """
    boosts: list[tuple] = []
    discards: list[tuple] = []
    for r in rules:
        if r.action not in ACTIONS:
            raise ValueError(f"unknown optic action {r.action!r}")
        ms: list[tuple] = []
        pq = r.parsed()
        if pq is not None:
            ms.append(("all", tuple(
                t for c in pq.positive for t in c.tokens)))
        if r.pattern is not None:
            ms.append(("pat", parse_pattern(r.pattern)))
        if not ms:
            raise ValueError("rule needs matches= and/or pattern=")
        matcher = ms[0] if len(ms) == 1 else ("and", tuple(ms))
        if r.action == "discard":
            discards.append(matcher)
        else:
            sign = 1.0 if r.action == "boost" else -1.0
            boosts.append((sign * float(r.factor), matcher))
    return boosts, discards


def rules_need_positions(boost_rules, discard_matchers) -> bool:
    return any(_has_pat(m) for _, m in boost_rules) or any(
        _has_pat(m) for m in discard_matchers)


def rules_need_doclen(boost_rules, discard_matchers) -> bool:
    def _end(m):
        kind, v = m
        if kind == "pat":
            return v.anchor_end
        if kind == "and":
            return any(_end(x) for x in v)
        return False
    return any(_end(m) for _, m in boost_rules) or any(
        _end(m) for m in discard_matchers)


def _has_pat(m) -> bool:
    kind, v = m
    if kind == "pat":
        return True
    if kind == "and":
        return any(_has_pat(x) for x in v)
    return False


def all_matcher_terms(boost_rules, discard_matchers) -> list[str]:
    out: list[str] = []
    for _, m in boost_rules:
        out.extend(_terms_rec(m))
    for m in discard_matchers:
        out.extend(_terms_rec(m))
    return list(dict.fromkeys(out))


def _terms_rec(m) -> list[str]:
    kind, v = m
    if kind == "and":
        return [t for x in v for t in _terms_rec(x)]
    return matcher_terms(m)
