"""robots.txt parser/matcher (functions/robots.py, RFC 9309)."""

import pytest

from pypdfium2_ray.functions.robots import is_allowed, parse_robots

_BASIC = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/public
Disallow: /tmp
"""


def test_longest_match_and_allow_override():
    rules = parse_robots(_BASIC)
    assert is_allowed(rules, "/")                       # no match
    assert not is_allowed(rules, "/private/x")
    assert is_allowed(rules, "/private/public/page")    # longer Allow wins
    assert not is_allowed(rules, "/tmpfile")            # prefix match


def test_allow_wins_length_ties():
    rules = [("/p", False), ("/p", True)]
    assert is_allowed(rules, "/page")


def test_wildcards_and_anchors():
    rules = parse_robots("User-agent: *\nDisallow: /*.pdf$\nDisallow: /a*b\n")
    assert not is_allowed(rules, "/docs/file.pdf")
    assert is_allowed(rules, "/docs/file.pdf?x=1")      # $ anchors the end
    assert not is_allowed(rules, "/aXYZb")
    assert is_allowed(rules, "/aXYZc")


def test_specific_agent_group_beats_star():
    txt = ("User-agent: *\nDisallow: /\n"
           "User-agent: graftbot\nDisallow: /only-this\n")
    rules = parse_robots(txt, agent="graftbot")
    assert is_allowed(rules, "/anything")
    assert not is_allowed(rules, "/only-this/x")
    other = parse_robots(txt, agent="otherbot")
    assert not is_allowed(other, "/anything")           # falls to *


def test_grouping_after_rules_resets_agents():
    txt = ("User-agent: a\nDisallow: /x\n"
           "User-agent: b\nDisallow: /y\n")
    assert not is_allowed(parse_robots(txt, "a"), "/x1")
    assert is_allowed(parse_robots(txt, "a"), "/y1")    # /y is b's rule
    assert not is_allowed(parse_robots(txt, "b"), "/y1")


def test_shared_group_and_empty_disallow():
    txt = ("User-agent: a\nUser-agent: b\nDisallow: /shared\n"
           "User-agent: c\nDisallow:\n")
    assert not is_allowed(parse_robots(txt, "a"), "/shared/x")
    assert not is_allowed(parse_robots(txt, "b"), "/shared/x")
    assert is_allowed(parse_robots(txt, "c"), "/anything")  # empty = none


def test_robots_gate_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pypdfium2_ray.functions.robots import robots_gate
    urls = ["doc://a/1", "doc://a/12", "doc://a/2",
            "doc://b/1", "doc://c/9"]
    t = pa.table({"url": pa.array(urls)})
    robots = {
        "a": "User-agent: *\nDisallow: /1\nAllow: /12\n",
        "b": "User-agent: *\nDisallow: /\n",
        # host c: no robots entry -> allowed
    }
    out = robots_gate(rd.from_arrow(t), robots).to_pandas()
    assert sorted(out["url"]) == ["doc://a/12", "doc://a/2", "doc://c/9"]
