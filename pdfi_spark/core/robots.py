"""robots.txt parsing + path matching — the crawl politeness stage.

Built from the public robots exclusion protocol (RFC 9309 / the Google
robots.txt spec); Spark-free like the rest of core/. Supported surface,
deliberately minimal and documented:

- ``User-agent`` groups (case-insensitive field names; consecutive
  User-agent lines share one group); a crawler takes the most specific
  matching group, falling back to ``*``.
- ``Allow`` / ``Disallow`` rule values are RFC 9309 §2.2.3 path
  patterns: anchored at the path start, ``*`` matches any character
  run (including empty), a trailing ``$`` anchors the end of the path;
  a ``$`` anywhere else is a literal octet. Everything else matches
  literally (``pattern_regex`` is the single pattern->regex
  translation all three engines share — Python ``re``, Spark
  ``regexp_like``, DuckDB ``regexp_matches``; it only emits escapes
  valid in all three dialects).
- Most-specific-match-wins across Allow+Disallow, specificity = octet
  length of the raw rule value (the RFC's measure — wildcards count as
  one octet); on equal length Allow wins (RFC 9309 §2.2.2); remaining
  ties break on the lexicographically greatest pattern so the winning
  rule is deterministic cross-engine. No matching rule -> allowed. An
  empty ``Disallow:`` value disallows nothing (emits no rule).
- ``#`` comments and unknown fields (Crawl-delay, Sitemap) are ignored.

The planted per-host fixtures (ROBOTS_TXT) are the single source for
both the Spark operator and its DuckDB oracle: the oracle derives its
closed-form CASE from ``rules_for`` + ``pattern_regex`` at SQL-build
time, so parser edits propagate to both engines.
"""
from __future__ import annotations

import math
import re
from functools import lru_cache

# deterministic per-host fixtures for the planted URL corpus
# (ops/webtext._raw_url_expr hosts; canonical paths are /Doc/0../Doc/49):
# example.com blocks the /Doc/1* segment range, re-allows the /Doc/13*
# subtree (longest-match + tie semantics), blocks every path ending in 7
# via the wildcard+anchor rule /Doc/*7$, and re-allows /Doc/47 via an
# equal-length Allow wildcard (the §2.2.2 Allow-wins-ties rule ON a
# wildcard pair); www.example.com has a specific-agent group (must be
# IGNORED when selecting '*') plus a '*' group blocking /Doc/2* while
# the end-anchored Allow: /Doc/2$ re-allows exactly /Doc/2.
ROBOTS_TXT: dict[str, str] = {
    "example.com": (
        "# crawl policy\n"
        "User-agent: *\n"
        "Disallow: /Doc/1\n"
        "Allow: /Doc/13\n"
        "Disallow: /Doc/*7$\n"
        "Allow: /Doc/4*7\n"
        "Crawl-delay: 2\n"
    ),
    "www.example.com": (
        "User-agent: special-bot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /Doc/2\n"
        "Allow: /Doc/2$\n"
        "Disallow:\n"
    ),
}

# regex metacharacters that every target dialect (Python re, Java
# java.util.regex, RE2) both treats specially and accepts backslash-
# escaped; pattern_regex emits nothing outside this set + . and *
_RX_SPECIALS = set("\\.^$*+?()[]{}|")

# hostile-input bound for the one BACKTRACKING engine in the stack: a
# rule like "/a*b*c*...$" costs O(path_len^k) in java.util.regex (the
# Spark regexp_like side — a hostile site controls both its robots rules
# and its URL lengths, so this is a real DoS surface). The Python core
# matcher below is a LINEAR two-pointer glob (no backtracking blowup)
# and DuckDB's RE2 is linear by construction, so the cap exists for the
# JVM path: star runs collapse for free (semantically identical), and a
# rule still carrying more than this many wildcards is DROPPED at parse
# time (fail-open: an unenforceable hostile rule yields no rule, it
# never stalls an executor). k=2 bounds the JVM worst case at
# O(path^2) ~ milliseconds on capped-length URLs; engines with linear
# regex (RE2) could raise this.
MAX_PATTERN_WILDCARDS = 2


def _collapse_stars(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*" and out and out[-1] == "*":
            continue
        out.append(ch)
    return "".join(out)


def pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> a regex string valid (and equivalent) in
    Python re, Java regex, and RE2: anchored with a leading ``^`` (all
    three engines are used in unanchored-search mode), ``*`` -> ``.*``
    (consecutive stars collapsed), a trailing ``$`` -> the end anchor,
    everything else literal."""
    pattern = _collapse_stars(pattern)
    body, anchor = (pattern[:-1], "$") if pattern.endswith("$") else (pattern, "")
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RX_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out) + anchor


def _glob_match(pattern: str, path: str) -> bool:
    """RFC 9309 path-pattern matching in O(len(pattern) * len(path)):
    anchored at the path start, ``*`` = any octet run, trailing ``$`` =
    end anchor, any other octet literal. Greedy two-pointer with
    single-last-star backtracking (the classic linear glob algorithm) —
    semantically identical to the regex translation but immune to the
    multi-wildcard backtracking blowup, which is why the Python side
    never needs the JVM path's wildcard cap."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    n, m = len(path), len(pattern)
    p = i = 0
    star, mark = -1, 0
    while True:
        if p == m:
            # pattern consumed: prefix semantics succeed immediately;
            # the end anchor additionally needs the path consumed
            if not anchored or i == n:
                return True
            # anchored and path remains: retry from the last star
            if star == -1:
                return False
            p, mark = star + 1, mark + 1
            i = mark
        elif pattern[p] == "*":
            star, mark = p, i
            p += 1
        elif i < n and pattern[p] == path[i]:
            p += 1
            i += 1
        elif star != -1 and mark < n:
            p, mark = star + 1, mark + 1
            i = mark
        else:
            return False


@lru_cache(maxsize=1024)
def _compiled(pattern: str) -> re.Pattern:
    return re.compile(pattern_regex(pattern))


def parse_robots(text: str) -> list[dict]:
    """robots.txt -> [{agents: [..], rules: [(allow: bool, prefix)]}].

    Groups are runs of User-agent lines followed by their rules;
    field names match case-insensitively; comments and blank lines are
    skipped (a blank line does NOT terminate a group per RFC 9309 —
    only a new User-agent run after rules does)."""
    groups: list[dict] = []
    current: dict | None = None
    agents_open = False  # collecting consecutive User-agent lines
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not agents_open:
                current = {"agents": [], "rules": [], "delay": None}
                groups.append(current)
                agents_open = True
            current["agents"].append(value.lower())
        elif field in ("allow", "disallow"):
            agents_open = False
            if current is None:  # rules before any User-agent: ignored
                continue
            if value == "":
                # empty Disallow = nothing disallowed; empty Allow is
                # meaningless — neither emits a rule
                continue
            # hostile-input hardening: star runs collapse (the stored
            # pattern IS the collapsed form — specificity length and
            # matched_prefix output use it consistently); a rule still
            # carrying more than MAX_PATTERN_WILDCARDS wildcards is
            # dropped (fail-open; see the constant's comment)
            value = _collapse_stars(value)
            if value.count("*") > MAX_PATTERN_WILDCARDS:
                continue
            current["rules"].append((field == "allow", value))
        elif field == "crawl-delay":
            agents_open = False
            if current is not None:
                try:
                    v = float(value)
                except ValueError:
                    pass  # garbage delay: ignored like any unknown field
                else:
                    # 'inf'/'nan'/negative parse as floats but are
                    # garbage as delays (NaN would even break the
                    # order-insensitive value hash downstream): treat
                    # non-finite/negative like any other garbage value
                    if math.isfinite(v) and v >= 0:
                        current["delay"] = v
        else:
            agents_open = False  # Sitemap etc.: ends the agent run
    return groups


def _group_for(text: str, agent: str = "*") -> dict | None:
    """Select the group for ``agent``: the longest agent token that is a
    prefix of ``agent`` wins, else the ``*`` group, else None."""
    agent = agent.lower()
    best: tuple[int, dict] | None = None
    star: dict | None = None
    for g in parse_robots(text):
        for a in g["agents"]:
            if a == "*":
                star = g if star is None else star
            elif agent.startswith(a):
                if best is None or len(a) > best[0]:
                    best = (len(a), g)
    if best is not None:
        return best[1]
    return star


def rules_for(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    g = _group_for(text, agent)
    return list(g["rules"]) if g is not None else []


def crawl_delay(text: str, agent: str = "*") -> float | None:
    """The selected group's Crawl-delay in seconds, or None. Not part of
    RFC 9309, but real robots.txt carries it and polite crawlers honor
    it (the frontier scheduler defaults hosts without one to 1 s)."""
    g = _group_for(text, agent)
    return g["delay"] if g is not None else None


def is_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Most-specific-match across Allow+Disallow (specificity = raw
    pattern octet length); Allow wins length ties, then the
    lexicographically greatest pattern (determinism only — the verdict
    is already fixed by the first two keys); no match -> allowed."""
    winner: tuple[int, bool, str] | None = None
    for allow, pattern in rules:
        if _glob_match(pattern, path):
            key = (len(pattern), allow, pattern)
            if winner is None or key > winner:
                winner = key
    return True if winner is None else winner[1]
