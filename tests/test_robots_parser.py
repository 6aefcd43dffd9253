"""robots.txt TEXT parser (VERDICT r01 item 6): Google/RFC-9309 grouping,
agent precedence, and end-to-end parity of the text path with the rule
table. Example tables mirror the publicly documented Google robots.txt
semantics (grouping, merging, longest-match + allow-wins-ties)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.robots import (
    allowed,
    fetch_robots_df,
    parse_robots_txt,
    render_robots_txt,
    robots_table_df,
    rules_for_host,
)

THREE_GROUPS = """\
user-agent: googlebot-news
disallow: /news-only

user-agent: *
disallow: /generic

user-agent: googlebot
disallow: /gbot
"""


@pytest.mark.parametrize(
    "agent, disallow",
    [
        ("googlebot-news", ["/news-only"]),   # exact token wins
        ("googlebot", ["/gbot"]),             # its own group
        ("googlebot-images", ["/gbot"]),      # longest-prefix: 'googlebot'
        ("otherbot-web", ["/generic"]),       # falls through to *
    ],
)
def test_group_selection(agent, disallow):
    a, d, _ = parse_robots_txt(THREE_GROUPS, agent)
    assert (a, d) == ([], disallow)


def test_groups_with_same_token_merge():
    text = """\
user-agent: googlebot-news
disallow: /fish
user-agent: *
disallow: /carrots
user-agent: googlebot-news
disallow: /shrimp
"""
    _, d, _ = parse_robots_txt(text, "googlebot-news")
    assert d == ["/fish", "/shrimp"]
    _, d, _ = parse_robots_txt(text, "anybot")
    assert d == ["/carrots"]


def test_consecutive_agent_lines_share_rules():
    text = "user-agent: abot\nuser-agent: bbot\ndisallow: /c\n"
    for agent in ("abot", "bbot"):
        assert parse_robots_txt(text, agent)[1] == ["/c"]


def test_lenient_parsing():
    text = (
        "﻿# header comment\r\n"
        "USER-AGENT: *  # inline comment\r\n"
        "Disallow:\r\n"            # empty value = no restriction
        "DisAllow: private\r\n"    # missing leading slash -> prepended
        "Allow: /ok$\r\n"
        "Crawl-Delay: 2.0\r\n"
        "noise line without colon maybe\r\n"
    )
    a, d, delay = parse_robots_txt(text, "heroshi")
    assert a == ["/ok$"]
    assert d == ["/private"]
    assert delay == 2


def test_rules_before_any_group_ignored():
    assert parse_robots_txt("disallow: /x\nuser-agent: *\ndisallow: /y\n", "b") == (
        [],
        ["/y"],
        None,
    )


def test_no_matching_group_means_all_allowed():
    text = "user-agent: googlebot\ndisallow: /\n"
    assert parse_robots_txt(text, "heroshi") == ([], [], None)


# -- parse + longest-match decision end to end (Google URL-matching table) --
@pytest.mark.parametrize(
    "text_rules, path, expect",
    [
        (("allow: /p", "disallow: /"), "/page", True),          # longest wins
        (("allow: /folder", "disallow: /folder"), "/folder/page", True),  # tie -> allow
        (("allow: /page", "disallow: /*.htm"), "/page.htm", False),       # /*.htm longer
        (("allow: /$", "disallow: /"), "/", True),
        (("allow: /$", "disallow: /"), "/page.htm", False),
    ],
)
def test_parse_then_match(text_rules, path, expect):
    text = "user-agent: *\n" + "\n".join(text_rules) + "\n"
    a, d, _ = parse_robots_txt(text, "heroshi")
    assert allowed(path, a, d) is expect


def test_render_parse_roundtrip_per_host():
    for host in [f"h{k}.example" for k in range(40)]:
        a, d, delay = rules_for_host(host)
        text = render_robots_txt(a, d, delay)
        assert parse_robots_txt(text, "heroshi") == (a, d, delay)


def test_fetch_robots_text_path_matches_table(spark):
    """fetch_robots_df(via_text=True) — simulated body rendered to TEXT and
    run through the real parser — must be bit-identical to the direct rule
    table (the production swap-point proof)."""
    hosts = [f"h{k}.example" for k in range(30)]
    hosts_df = spark.createDataFrame([(h,) for h in hosts], "host string")
    via_text = {
        r["host"]: (list(r["allow_prefixes"]), list(r["disallow_prefixes"]), r["crawl_delay_slots"])
        for r in fetch_robots_df(hosts_df, via_text=True).collect()
    }
    table = {
        r["host"]: (list(r["allow_prefixes"]), list(r["disallow_prefixes"]), r["crawl_delay_slots"])
        for r in robots_table_df(spark, hosts).collect()
    }
    assert via_text == table


# --- allowed_batch ≡ allowed (the vectorized dict-mode matcher) -------------

@given(
    st.lists(
        st.text(alphabet="ab9/*$x", min_size=0, max_size=8), min_size=0, max_size=4
    ),
    st.lists(
        st.text(alphabet="ab9/*$x", min_size=0, max_size=8), min_size=0, max_size=4
    ),
    st.lists(st.text(alphabet="ab9/x.", min_size=0, max_size=10), min_size=1, max_size=8),
)
@settings(max_examples=400, deadline=None)
def test_allowed_batch_equals_scalar(allow, disallow, paths):
    import numpy as np

    from crawlspark.robots import allowed, allowed_batch

    got = allowed_batch(np.array(paths, dtype=object), allow, disallow)
    want = [allowed(p, allow, disallow) for p in paths]
    assert list(got) == want, f"allow={allow} disallow={disallow} paths={paths}"


def test_allowed_batch_none_paths():
    import numpy as np

    from crawlspark.robots import allowed, allowed_batch

    got = allowed_batch(np.array([None, "/private/x"], dtype=object), [], ["/private"])
    assert list(got) == [allowed(None, [], ["/private"]), allowed("/private/x", [], ["/private"])]


# ---------------------------------------------------------------------------
# Sitemap: directive autodiscovery
# ---------------------------------------------------------------------------


def test_sitemap_directive_is_filewide_and_deduped():
    from crawlspark.robots import parse_sitemap_urls

    text = (
        "Sitemap: http://a.example/sm.xml\n"   # before any group
        "User-agent: *\n"
        "Disallow: /private\n"
        "sitemap: http://a.example/sm2.xml\n"  # inside a group, lowercase
        "User-agent: other\n"
        "Sitemap: http://a.example/sm.xml\n"   # duplicate: dropped
        "Sitemap: http://a.example/sm3.xml # trailing comment\n"
    )
    assert parse_sitemap_urls(text) == [
        "http://a.example/sm.xml",
        "http://a.example/sm2.xml",
        "http://a.example/sm3.xml",
    ]
    assert parse_sitemap_urls(None) == []
    assert parse_sitemap_urls("User-agent: *\nDisallow:\n") == []


def test_sitemap_render_parse_roundtrip_does_not_disturb_rules():
    from crawlspark.robots import (
        parse_robots_txt,
        parse_sitemap_urls,
        render_robots_txt,
    )

    text = render_robots_txt(
        ["/p/9x"], ["/p/9", "/private"], 2,
        sitemaps=["http://h.example/sitemap.xml"],
    )
    assert parse_sitemap_urls(text) == ["http://h.example/sitemap.xml"]
    # the added file-wide directive must not perturb the group parse
    assert parse_robots_txt(text) == (["/p/9x"], ["/p/9", "/private"], 2)


def test_discover_sitemaps_matches_pure_python(spark):
    from crawlspark.robots import discover_sitemaps, sitemap_urls_for_host

    hosts = [f"h{k}.example" for k in range(30)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {(r["host"], r["sitemap_url"]) for r in discover_sitemaps(df).collect()}
    exp = {(h, u) for h in hosts for u in sitemap_urls_for_host(h)}
    assert got == exp
    assert got, "fixture must advertise at least one sitemap"
    assert len({h for h, _ in got}) < len(hosts), "not every host advertises"
