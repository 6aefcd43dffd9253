"""Robots longest-match table (F5/U-7) + Bloom guarantees (U-3/U-4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.bloom import BucketFilter, bloom_params, build_blob, probe_blob
from crawlspark.robots import allowed, rules_for_host

ROBOTS_TABLE = [
    # path, allow, disallow, expected  (Google longest-match semantics)
    ("/", [], [], True),
    ("/private/x", [], ["/private"], False),
    ("/privately", [], ["/private"], False),  # prefix match, not segment match
    ("/public", [], ["/private"], True),
    ("/p/9", ["/p/9x"], ["/p/9"], False),
    ("/p/9x", ["/p/9x"], ["/p/9"], True),     # longer allow wins
    ("/p/9xy", ["/p/9x"], ["/p/9"], True),
    ("/a/b", ["/a"], ["/a/b"], False),        # longer disallow wins
    ("/a/b", ["/a/b"], ["/a/b"], True),       # tie -> allow wins
    ("/x", None, None, True),
    (None, [], ["/"], False),                 # None path treated as "/"
]


def test_robots_longest_match_table():
    for path, allow, disallow, want in ROBOTS_TABLE:
        assert allowed(path, allow, disallow) == want, (path, allow, disallow)


def test_rules_deterministic():
    assert rules_for_host("h0.example") == rules_for_host("h0.example")
    a, d, delay = rules_for_host("h3.example")
    assert 1 <= delay <= 3


def test_bloom_no_false_negatives():
    m, k = bloom_params(5000, 0.01)
    hashes = np.arange(-2500, 2500, dtype=np.int64) * 7919
    blob = build_blob(hashes, m, k)
    assert probe_blob(hashes, blob, m, k).all()


def test_bloom_fpp_bound():
    m, k = bloom_params(10000, 0.01)
    inserted = np.arange(10000, dtype=np.int64) * 1_000_003
    others = np.arange(10000, dtype=np.int64) * 1_000_003 + 17
    blob = build_blob(inserted, m, k)
    fpp = probe_blob(others, blob, m, k).mean()
    assert fpp < 0.03, fpp  # 3x headroom over the 1% target


def test_bucket_filter_absorb_and_growth():
    f = BucketFilter.empty(capacity=128, fpp=0.01)
    a = np.arange(100, dtype=np.int64)
    f.add(a)
    assert f.probe(a).all()
    partial = build_blob(np.arange(100, 200, dtype=np.int64), f.m, f.k)
    f.absorb_blob(partial, 100)
    assert f.probe(np.arange(200, dtype=np.int64)).all()
    assert f.n == 200


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_bloom_membership_property(xs):
    arr = np.array(xs or [0], dtype=np.int64)
    m, k = bloom_params(max(len(arr), 16), 0.01)
    blob = build_blob(arr, m, k)
    assert probe_blob(arr, blob, m, k).all()


WILDCARD_TABLE = [
    # path, allow, disallow, expected — Google robots.txt spec examples
    ("/fish.php", [], ["/fish*.php"], False),
    ("/fishheads/catfish.php?p=1", [], ["/fish*.php"], False),
    ("/Fish.PHP", [], ["/fish*.php"], True),          # case-sensitive
    ("/filename.php", [], ["/*.php$"], False),
    ("/filename.php?parameters", [], ["/*.php$"], True),  # $ anchors end
    ("/filename.php/", [], ["/*.php$"], True),
    ("/fish", [], ["/fish$"], False),
    ("/fishing", [], ["/fish$"], True),
    ("/x/page.htm", ["/x/page"], ["/*.htm"], True),    # allow rule is longer (7 > 6)
    ("/page", ["/p"], ["/"], True),
    ("/folder/page", ["/folder"], ["/folder"], True),  # tie -> allow
    ("/page.htm", ["/page"], ["/*.htm"], False),       # /*.htm is longer
]


def test_robots_wildcard_table():
    for path, allow, disallow, want in WILDCARD_TABLE:
        assert allowed(path, allow, disallow) == want, (path, allow, disallow)
