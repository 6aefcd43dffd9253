"""Golden canonicalization vectors + properties (SURVEY.md §6.2.1-2)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.urlnorm import canon_url, host_of, is_valid_url, path_of, resolve_url

GOLDEN = [
    ("HTTP://H0.EXAMPLE:80/", "http://h0.example/"),
    ("https://Host.Example:443/x", "https://host.example/x"),
    ("http://h1.example/a/../b/./c", "http://h1.example/b/c"),
    ("http://h2.example/x#fragment", "http://h2.example/x"),
    ("http://h3.example/x?utm_source=z&q=1", "http://h3.example/x?q=1"),
    ("http://h3.example/x?UTM_CAMPAIGN=z", "http://h3.example/x"),
    ("http://h4.example/%7euser/%41bc", "http://h4.example/~user/Abc"),
    ("http://h4.example/%2fkeep", "http://h4.example/%2Fkeep"),  # reserved stays encoded, uppercased
    ("http://h5.example", "http://h5.example/"),
    ("http://h5.example./", "http://h5.example/"),
    ("http://h6.example:8080/p", "http://h6.example:8080/p"),    # non-default port kept
    ("http://h7.example/a/b/../../c", "http://h7.example/c"),
    ("http://h7.example/a/b/..", "http://h7.example/a/"),
    ("http://h8.example/?", "http://h8.example/"),
    ("  http://h9.example/sp  ", "http://h9.example/sp"),
    ("ftp://h9.example/skip", None),
    ("not a url", None),
    ("", None),
    (None, None),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_golden_vectors(raw, expected):
    assert canon_url(raw) == expected


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_canon_idempotent(s):
    c = canon_url(s)
    if c is not None:
        assert canon_url(c) == c


def test_resolve():
    assert resolve_url("http://h0.example/a/b", "/p/1") == "http://h0.example/p/1"
    assert resolve_url("http://h0.example/a/b", "../p/1") == "http://h0.example/p/1"
    assert resolve_url("http://h0.example/a/b/", "../p/1") == "http://h0.example/a/p/1"
    assert resolve_url("http://h0.example/a", "http://h1.example/z") == "http://h1.example/z"
    assert resolve_url(None, "/p/1") is None
    assert resolve_url("http://h0.example/", "") is None


def test_host_path():
    assert host_of("http://h0.example:8080/x") == "h0.example"
    assert path_of("http://h0.example/x?q=1") == "/x?q=1"
    assert path_of("http://h0.example/") == "/"
    assert is_valid_url("http://h0.example/")
    assert not is_valid_url("x" * 10)
    assert not is_valid_url("http://" + "y" * 3000)


@given(st.text(alphabet="abcxyz019.-_~/:?#%ABC", max_size=60))
@settings(max_examples=500, deadline=None)
def test_fast_path_agrees_with_slow_path(s):
    """Any URL the fast-path regex accepts must be a fixed point of the
    full canonicalizer (run with the fast path disabled)."""
    from crawlspark import urlnorm

    for candidate in (f"http://h3.example/{s}", f"http://{s}/p/1", s):
        if urlnorm._FAST_CANON.match(candidate):
            m = urlnorm._FAST_CANON
            try:
                urlnorm._FAST_CANON = re.compile(r"(?!)")  # never matches
                assert urlnorm.canon_url(candidate) == candidate, candidate
            finally:
                urlnorm._FAST_CANON = m


BASES = [
    "http://h0.example/a/b",
    "http://h0.example/a/b/",
    "http://h0.example/",
    "http://h0.example",
    "https://u:p@h1.example:8080/x/y",
    "http://h2.example/p?x=1",
    "http://h2.example/p?x=1/trap",
    None,
    "ftp://weird.example/x",
]
REFS = [
    "http://abs.example/z", "https://abs.example/z",
    "/p/1", "/p/1?q=2", "/b/../c", "//other.example/q",
    "sib", "sib/2", "./dot", "../up", "../../up2", "..", ".",
    "x:y-esc", "./x:y", "mailto:a@b", "ftp://n.example/",
    "?q=only", "#frag", "", None, "p?q=/..", "a//b", "/./",
]


def test_resolve_batch_canonically_equals_resolve_url():
    """The vectorized resolver's concat fast paths may leave dot segments,
    but canon∘resolve_batch must equal canon∘resolve_url on every
    (base, ref) pair — the invariant the fused candidate pass relies on."""
    import pandas as pd

    from crawlspark.urlnorm import resolve_batch

    pairs = [(b, r) for b in BASES for r in REFS]
    bases = pd.Series([p[0] for p in pairs], dtype="object")
    refs = pd.Series([p[1] for p in pairs], dtype="object")
    got = resolve_batch(bases, refs)
    for i, (b, r) in enumerate(pairs):
        want = canon_url(resolve_url(b, r)) if resolve_url(b, r) else None
        have = canon_url(got[i]) if got[i] is not None else None
        assert have == want, f"base={b!r} ref={r!r}: {have!r} != {want!r}"


@given(
    st.sampled_from([b for b in BASES if b]),
    st.text(alphabet="abcz019./-_~:?#%", max_size=30),
)
@settings(max_examples=500, deadline=None)
def test_resolve_batch_property(base, ref):
    import pandas as pd

    from crawlspark.urlnorm import resolve_batch

    got = resolve_batch(pd.Series([base], dtype="object"), pd.Series([ref], dtype="object"))[0]
    want = resolve_url(base, ref)
    gc = canon_url(got) if got is not None else None
    wc = canon_url(want) if want is not None else None
    assert gc == wc, f"ref={ref!r}: {gc!r} != {wc!r}"


CANON_BATCH_CASES = [
    "http://h3.example/p/123",
    "HTTP://H0.EXAMPLE:80/",
    "https://h6.example:443/tls",
    "http://h2.example:8080/x",
    "http://h1.example/a/../b/c",
    "http://h1.example/a/b/../../c",
    "http://h1.example/../p/9",
    "http://h1.example/p/../p/44",
    "http://h1.example/./x",
    "http://h1.example/a/.",
    "http://h1.example/a/b/..",
    "http://h1.example/x#frag",
    "http://h1.example/x?utm_source=1&q=2",
    "http://h4.example/%7euser/%41bc",
    "http://h1.example/file.html",
    "http://h1.example/.../x",
    "ftp://h9.example/skip",
    None,
    "http://h1.example",
    "http://User@h1.example/x",
    "HTTPS://H2.EXAMPLE/A/../b",
    "http://h1.example/a//b/../c",
    "http://h1.example/../../x",
    "http://h1.example/a/../../x",
    "http://h1.example/x.",
]


def test_canon_batch_equals_scalar_on_goldens():
    """Every tier of canon_batch (fast capture, vectorized assist, scalar
    fallback) must agree with canon_url / host_of / path_of elementwise."""
    import numpy as np

    from crawlspark import urlnorm

    urls = np.array(CANON_BATCH_CASES, dtype=object)
    out, hosts, paths = urlnorm.canon_batch(urls, np.ones(len(urls), bool))
    for u, o, h, p in zip(CANON_BATCH_CASES, out, hosts, paths):
        exp = urlnorm.canon_url(u)
        assert o == exp, (u, o, exp)
        if exp is not None:
            assert h == urlnorm.host_of(exp), (u, h)
            assert p == urlnorm.path_of(exp), (u, p)


@given(
    st.text(alphabet="abAB019-_~./", max_size=30),
    st.sampled_from(["http://", "HTTP://", "https://", "HtTpS://"]),
    st.sampled_from(["h0.example", "H0.EXAMPLE", "h0.example:80",
                     "H1.Example:443", "h2.example:8080"]),
)
@settings(max_examples=500, deadline=None)
def test_canon_batch_property(path, scheme, hostport):
    """Property: canon_batch ≡ canon_url on arbitrary case/port/dot-segment
    paths (the assist tier's whole acceptance envelope plus rejections)."""
    import numpy as np

    from crawlspark import urlnorm

    u = f"{scheme}{hostport}/{path}"
    out, hosts, paths = urlnorm.canon_batch(
        np.array([u], dtype=object), np.ones(1, bool)
    )
    exp = urlnorm.canon_url(u)
    assert out[0] == exp, (u, out[0], exp)
    if exp is not None:
        assert hosts[0] == urlnorm.host_of(exp)
        assert paths[0] == urlnorm.path_of(exp)


def test_resolve_batch_empty_authority_refs():
    """Regression (hypothesis-found): '//' with an empty-or-degenerate
    authority is treated by CPython's urljoin as an empty/path reference,
    NOT a protocol-relative one — the vectorized fast paths must exclude
    every such ref (they fall to the urljoin remainder loop)."""
    import pandas as pd

    from crawlspark.urlnorm import canon_url, resolve_batch, resolve_url

    refs = ["//", "///x", "//?q", "//#f", "////", "//h", "//:8080/x"]
    for base in ["http://h0.example/a/b", "https://h1.example/"]:
        got = resolve_batch(
            pd.Series([base] * len(refs), dtype="object"),
            pd.Series(refs, dtype="object"),
        )
        for ref, g in zip(refs, got):
            want = resolve_url(base, ref)
            gc = canon_url(g) if g is not None else None
            wc = canon_url(want) if want is not None else None
            assert gc == wc, (base, ref, gc, wc)
