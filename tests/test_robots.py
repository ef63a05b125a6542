"""robots.txt parser + matcher (core/robots.py)."""
from pdfi_spark.core.robots import (
    ROBOTS_TXT,
    is_allowed,
    parse_robots,
    rules_for,
)


def test_group_parsing_and_comments():
    groups = parse_robots(ROBOTS_TXT["example.com"])
    assert len(groups) == 1
    assert groups[0]["agents"] == ["*"]
    # Crawl-delay ignored; comment line ignored
    assert groups[0]["rules"] == [(False, "/Doc/1"), (True, "/Doc/13")]


def test_consecutive_user_agents_share_a_group():
    g = parse_robots("User-agent: a\nUser-agent: b\nDisallow: /x\n")
    assert g[0]["agents"] == ["a", "b"]
    assert g[0]["rules"] == [(False, "/x")]


def test_agent_selection_prefers_specific_then_star():
    txt = ROBOTS_TXT["www.example.com"]
    assert rules_for(txt, "special-bot/1.0") == [(False, "/")]
    assert rules_for(txt, "otherbot") == [(False, "/Doc/2")]
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


def test_edge_cases_contained():
    assert parse_robots("") == []
    assert rules_for("", "x") == []
    assert is_allowed([], "/anything")
    # rules before any User-agent line are ignored
    assert parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y\n")[0][
        "rules"
    ] == [(False, "/y")]
