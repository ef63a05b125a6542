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


def test_pattern_regex_shared_dialect():
    assert pattern_regex("/Doc/1") == "^/Doc/1"
    assert pattern_regex("/Doc/*7$") == "^/Doc/.*7$"
    assert pattern_regex("/a.b(c)|d") == "^/a\\.b\\(c\\)\\|d"
    # a $ not at the end is escaped as a literal
    assert pattern_regex("/a$b") == "^/a\\$b"
    import re
    assert re.search(pattern_regex("/a$b"), "/a$bcd")


def test_edge_cases_contained():
    assert parse_robots("") == []
    assert rules_for("", "x") == []
    assert is_allowed([], "/anything")
    # rules before any User-agent line are ignored
    assert parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y\n")[0][
        "rules"
    ] == [(False, "/y")]
