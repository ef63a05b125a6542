"""robots.txt parser + matcher (core/robots.py)."""
from pdfi_spark.core.robots import (
    ROBOTS_TXT,
    is_allowed,
    parse_robots,
    pattern_regex,
    rules_for,
)


def test_group_parsing_and_comments():
    groups = parse_robots(ROBOTS_TXT["example.com"])
    assert len(groups) == 1
    assert groups[0]["agents"] == ["*"]
    # Crawl-delay ignored; comment line ignored
    assert groups[0]["rules"] == [
        (False, "/Doc/1"), (True, "/Doc/13"),
        (False, "/Doc/*7$"), (True, "/Doc/4*7"),
    ]


def test_consecutive_user_agents_share_a_group():
    g = parse_robots("User-agent: a\nUser-agent: b\nDisallow: /x\n")
    assert g[0]["agents"] == ["a", "b"]
    assert g[0]["rules"] == [(False, "/x")]


def test_agent_selection_prefers_specific_then_star():
    txt = ROBOTS_TXT["www.example.com"]
    assert rules_for(txt, "special-bot/1.0") == [(False, "/")]
    assert rules_for(txt, "otherbot") == [(False, "/Doc/2"), (True, "/Doc/2$")]
    # empty Disallow emitted no rule
    assert all(p for _, p in rules_for(txt, "otherbot"))


def test_longest_match_and_allow_tiebreak():
    rules = rules_for(ROBOTS_TXT["example.com"])
    assert not is_allowed(rules, "/Doc/1")
    assert not is_allowed(rules, "/Doc/12")
    assert is_allowed(rules, "/Doc/13")  # longer Allow beats Disallow
    assert is_allowed(rules, "/Doc/135")
    assert is_allowed(rules, "/Doc/3")  # no matching rule
    # equal-length tie -> Allow wins
    assert is_allowed([(False, "/a"), (True, "/a")], "/ab")


def test_wildcard_and_end_anchor_rules():
    # RFC 9309 §2.2.3: * = any run of octets, trailing $ = path end
    rules = rules_for(ROBOTS_TXT["example.com"])
    assert not is_allowed(rules, "/Doc/7")    # /Doc/*7$ (empty * run)
    assert not is_allowed(rules, "/Doc/17")   # wildcard beats /Doc/1 (shorter)
    assert not is_allowed(rules, "/Doc/37")
    assert is_allowed(rules, "/Doc/47")       # equal-length Allow /Doc/4*7 wins
    assert is_allowed(rules, "/Doc/45")       # 4*7 needs the closing 7
    # /Doc/172 does NOT match the end-anchored /Doc/*7$ ...
    assert is_allowed([(False, "/Doc/*7$")], "/Doc/172")
    # ... but the full ruleset still blocks it via the /Doc/1 prefix rule
    assert not is_allowed(rules, "/Doc/172")
    # end anchor re-allows exactly the bare path
    r2 = rules_for(ROBOTS_TXT["www.example.com"])
    assert is_allowed(r2, "/Doc/2")
    assert not is_allowed(r2, "/Doc/20")
    # mid-pattern $ is a literal octet
    assert is_allowed([(False, "/a$b")], "/a-b")
    assert not is_allowed([(False, "/a$b")], "/a$bc")


def test_hostile_wildcard_rules_bounded():
    import time

    from pdfi_spark.core.robots import _glob_match

    # star runs collapse to one star (semantically identical)
    assert parse_robots("User-agent: *\nDisallow: /a****b\n")[0][
        "rules"] == [(False, "/a*b")]
    assert pattern_regex("/a****b") == "^/a.*b"
    # a rule with more wildcards than the JVM-path cap is dropped
    # entirely (fail-open) so regexp_like never sees a ReDoS shape
    hostile = "/" + "a*" * 30 + "$"
    assert parse_robots(f"User-agent: *\nDisallow: {hostile}\n")[0][
        "rules"] == []
    # the Python core matcher is LINEAR: even a 30-wildcard pattern
    # against a 20k-char non-matching path finishes instantly (the
    # regex translation of the same pattern would take astronomically
    # long in a backtracking engine)
    t0 = time.monotonic()
    # trailing-star anchor absorbs the rest: a genuine match, instantly
    assert _glob_match(hostile, "/" + "a" * 20000)
    # the never-satisfiable 'b$' tail is the backtracking worst case:
    # the linear matcher still answers instantly
    assert not _glob_match("/" + "a*" * 30 + "b$", "/" + "a" * 20000)
    assert time.monotonic() - t0 < 1.0


def test_glob_match_equals_regex_translation():
    # the linear matcher and the shared-dialect regex must be the SAME
    # function on the full semantic surface (prefix vs end anchor,
    # literal $, star runs, empty patterns)
    import itertools
    import re

    from pdfi_spark.core.robots import _glob_match

    alphabet = "ab*$/"
    for plen in range(0, 4):
        for pat in ("".join(t) for t in itertools.product(alphabet, repeat=plen)):
            rx = re.compile(pattern_regex(pat))
            for path in ("", "/", "/a", "/ab", "/ba", "/aab", "/ab$",
                         "/abab", "aa", "b/a$b"):
                assert _glob_match(pat, path) == bool(rx.search(path)), (
                    pat, path)


def test_pattern_regex_shared_dialect():
    assert pattern_regex("/Doc/1") == "^/Doc/1"
    assert pattern_regex("/Doc/*7$") == "^/Doc/.*7$"
    assert pattern_regex("/a.b(c)|d") == "^/a\\.b\\(c\\)\\|d"
    # a $ not at the end is escaped as a literal
    assert pattern_regex("/a$b") == "^/a\\$b"
    import re
    assert re.search(pattern_regex("/a$b"), "/a$bcd")


def test_parser_and_matcher_total_on_arbitrary_text():
    # fuzz-containment, same style as the WARC/PDF suites: arbitrary
    # bytes-ish text must parse without raising, every emitted rule must
    # be matchable, and crawl_delay stays float-or-None
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdfi_spark.core.robots import crawl_delay

    @settings(max_examples=200, deadline=None)
    @given(st.text(
        alphabet=st.characters(min_codepoint=0, max_codepoint=0x2ff),
        max_size=400,
    ))
    def run(text):
        groups = parse_robots(text)
        for g in groups:
            assert g["agents"]
            for allow, pattern in g["rules"]:
                assert isinstance(allow, bool)
                assert pattern and pattern.count("*") <= 2
            is_allowed(g["rules"], "/some/path*with$specials")
        d = crawl_delay(text)
        assert d is None or isinstance(d, float)
        rules_for(text, "anybot/1.0")

    run()


def test_edge_cases_contained():
    assert parse_robots("") == []
    assert rules_for("", "x") == []
    assert is_allowed([], "/anything")
    # rules before any User-agent line are ignored
    assert parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y\n")[0][
        "rules"
    ] == [(False, "/y")]
