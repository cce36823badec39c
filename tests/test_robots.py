"""robots.txt parser semantics — line cases from
/root/reference/fineweb_analyzer.py:320-349."""

from __future__ import annotations

from pyspark.sql import functions as F

from fineweb_domain_analyzer_spark.functions.robots import (
    parse_robots_py,
    policy_from_robots_content,
)


def test_disallow_root_denies():
    r = parse_robots_py("User-agent: *\nDisallow: /")
    assert r["crawl_allowed"] is False


def test_path_disallow_recorded_not_denying():
    r = parse_robots_py("User-agent: *\nDisallow: /private\nDisallow: /tmp/")
    assert r["crawl_allowed"] is True
    assert r["disallowed_paths"] == ["/private", "/tmp/"]


def test_allow_lines_ignored():
    # The reference parser has no Allow handling (doc/code discrepancy;
    # code is oracle) — Allow must not rescue a Disallow: /.
    r = parse_robots_py("User-agent: *\nDisallow: /\nAllow: /public")
    assert r["crawl_allowed"] is False


def test_other_agent_section_not_applied():
    r = parse_robots_py("User-agent: googlebot\nDisallow: /")
    assert r["crawl_allowed"] is True


def test_ua_match_case_insensitive():
    r = parse_robots_py("User-Agent: MyBot\nDisallow: /", user_agent="mybot")
    assert r["crawl_allowed"] is False


def test_comments_and_blanks_skipped():
    r = parse_robots_py("# hello\n\nUser-agent: *\n# nope\nDisallow: /")
    assert r["crawl_allowed"] is False


def test_mixed_case_directives():
    r = parse_robots_py("USER-AGENT: *\nDISALLOW: /\nCRAWL-DELAY: 2.5")
    assert r["crawl_allowed"] is False
    assert r["crawl_delay"] == 2.5


def test_unparseable_crawl_delay_dropped():
    r = parse_robots_py("User-agent: *\nCrawl-delay: soon")
    assert r["crawl_delay"] is None


def test_empty_disallow_is_noop():
    r = parse_robots_py("User-agent: *\nDisallow:")
    assert r["crawl_allowed"] is True
    assert r["disallowed_paths"] == []


def test_section_switch_resets_applicability():
    r = parse_robots_py("User-agent: googlebot\nDisallow: /\nUser-agent: *\nDisallow: /x")
    assert r["crawl_allowed"] is True
    assert r["disallowed_paths"] == ["/x"]


def test_none_content_defaults_allow():
    r = parse_robots_py(None)
    assert r["crawl_allowed"] is True


def test_policy_from_robots_content(spark):
    rows = [
        ("a.com", "User-agent: *\nDisallow: /", None),
        ("b.com", "User-agent: *\nDisallow: /private\nCrawl-delay: 3", None),
        ("c.com", None, None),  # 404 branch → allowed
        ("d.com", None, "conn refused"),  # fetch error → denied
    ]
    df = spark.createDataFrame(
        rows, "domain string, robots_content string, error string"
    )
    got = {
        r["domain"]: r
        for r in policy_from_robots_content(df).collect()
    }
    assert got["a.com"]["crawl_allowed"] is False
    assert got["a.com"]["robots_exists"] is True
    assert got["b.com"]["crawl_allowed"] is True
    assert got["b.com"]["crawl_delay"] == 3.0
    assert got["b.com"]["disallowed_paths"] == ["/private"]
    assert got["c.com"]["crawl_allowed"] is True
    assert got["c.com"]["robots_exists"] is False
    assert got["d.com"]["crawl_allowed"] is False
    assert got["d.com"]["error"] == "conn refused"


def test_parser_roundtrip_against_fixture(spark, fixtures_dir):
    """Re-parse the frozen robots_content from the reference snapshot and
    check our parser reproduces the recorded crawl_allowed for every
    domain where content was captured (robots_exists=True)."""
    import json

    with open(fixtures_dir / "robots_check_20250724_133214.json") as f:
        results = json.load(f)["results"]
    checked = 0
    for domain, rec in results.items():
        if rec.get("robots_exists") and "robots_content" in rec:
            parsed = parse_robots_py(rec["robots_content"])
            assert parsed["crawl_allowed"] == rec["crawl_allowed"], domain
            checked += 1
    assert checked > 0
