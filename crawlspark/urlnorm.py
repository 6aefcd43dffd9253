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

# Slow-path ASSIST tier: rows that miss the fast regex only by scheme/host
# letter case, an explicit port, or simple dot-segments are still
# str-op-able — lowercase + default-port drop + meaning-preserving
# dot-segment reduction passes, all vectorized. Still conservative: no
# userinfo, no query/fragment, no percent-encoding, and the row is only
# ACCEPTED if the reduced path has no '.' left at all (anything else —
# file dots, unreduced segments, trailing '/.'-semantics — falls through
# to the scalar canon_url, which stays the definition).
_SLOW_HOST = (
    r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*"
)
_SLOW_CANON_CAP = re.compile(
    rf"^([Hh][Tt][Tt][Pp][Ss]?)://({_SLOW_HOST})(?::([0-9]+))?"
    rf"((?:/[A-Za-z0-9\-_~./]*)?)$"
)
# one '<seg>/../' pop (seg can itself be '..' — popping it matches the RFC
# stack result, see canon_batch) and the drop of root-level '../' runs
_POP_DOTSEG = re.compile(r"/[^/]+/\.\./")
_LEAD_DOTSEG = re.compile(r"^/(?:\.\./)+")


def canon_batch(urls, alive):
    """Vectorized canonicalization of an object ndarray of absolute URLs →
    (canon_urls, hosts, paths) object ndarrays; rows outside `alive` (or
    unusable) stay None. Three tiers, each provably equal to canon_url on
    the rows it accepts (property-tested in tests/test_urlnorm.py):

    1. already-canonical fast capture (~90% of crawl links);
    2. the vectorized assist above (case / default port / dot-segments —
       the dominant residue: every dotted relative link lands here);
    3. scalar canon_url for the remainder.
    """
    import numpy as np
    import pandas as pd

    n = len(urls)
    out = np.array(urls, dtype=object)
    hosts = np.full(n, None, dtype=object)
    paths = np.full(n, None, dtype=object)
    us = pd.Series(urls, dtype="object")

    cap = us.str.extract(_FAST_CANON_CAP, expand=True)
    fast = cap[0].notna().to_numpy(bool) & alive
    hosts[fast] = cap[0].to_numpy(object)[fast]
    paths[fast] = cap[1].to_numpy(object)[fast]

    todo = alive & ~fast & us.notna().to_numpy(bool)
    if todo.any():
        cap2 = us.str.extract(_SLOW_CANON_CAP, expand=True)
        m = todo & cap2[0].notna().to_numpy(bool)
        if m.any():
            scheme = cap2[0].str.lower()
            host = cap2[1].str.lower()
            port = cap2[2]
            path = cap2[3].fillna("")
            path = path.where(path != "", "/")
            # '/a/b/..' and '/a/.' re-add a trailing slash in the RFC
            # algorithm — scalar tier handles those
            endbad = path.str.endswith(("/.", "/.."), na=False)
            # meaning-preserving reduction to a fixpoint: each pass removes
            # '/./', pops one '<seg>/../' per site (left-to-right, which IS
            # the stack order — a seg of '..' only ever pops when a
            # preceding '..' survived to its left, and dropping both
            # matches the root-level '..' drop), then drops root '../'
            for _ in range(8):
                p2 = path.str.replace("/./", "/", regex=False)
                p2 = p2.str.replace(_POP_DOTSEG, "/", regex=True)
                p2 = p2.str.replace(_LEAD_DOTSEG, "/", regex=True)
                if p2.equals(path):
                    break
                path = p2
            accept = (
                m
                & ~endbad.to_numpy(bool)
                & ~path.str.contains(".", regex=False, na=True).to_numpy(bool)
            )
            if accept.any():
                default_port = (
                    port.isna()
                    | ((scheme == "http") & (port == "80"))
                    | ((scheme == "https") & (port == "443"))
                )
                hostport = host.where(default_port, host + ":" + port)
                rebuilt = scheme + "://" + hostport + path
                out[accept] = rebuilt.to_numpy(object)[accept]
                # host_of excludes the port, path_of has no query here
                hosts[accept] = host.to_numpy(object)[accept]
                paths[accept] = path.to_numpy(object)[accept]
                todo = todo & ~accept

    for i in np.nonzero(todo)[0]:
        u = canon_url(urls[i])
        if u is None:
            out[i] = None
            continue
        out[i] = u
        hosts[i] = host_of(u) or None
        paths[i] = path_of(u)
    out[~alive] = None
    return out, hosts, paths


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


def resolve_batch(bases, refs, alive=None):
    """Vectorized reference resolution over pandas Series — CANONICALLY
    equal to per-row resolve_url (tests/test_urlnorm.py property-checks
    canon∘resolve_batch ≡ canon∘resolve_url):

    - absolute http(s) refs pass through;
    - protocol-relative ``//host/p`` refs take the base's scheme;
    - path-absolute ``/p`` refs concat onto the base's scheme+authority;
    - sibling/dotted relatives (``x``, ``./x``, ``../x``) concat onto the
      base's directory.

    The concat paths deliberately SKIP urljoin's dot-segment removal: the
    downstream canonicalizer performs the identical RFC 3986 §5.2.4
    resolution (and a dotted URL can never take the already-canonical fast
    path, whose grammar excludes '.'), so the canonical output is
    bit-identical while ~all rows avoid per-row Python. Only refs the fast
    grammar can't place (``?q``/``#f`` refs, scheme-colon first segments
    like ``mailto:``) fall back to the urljoin loop.

    Returns an object ndarray of resolved URLs (None where unusable)."""
    import numpy as np
    import pandas as pd

    r = pd.Series(refs, dtype="object")
    r = r.where(r.notna(), "")
    b = pd.Series(bases, dtype="object")
    n = len(r)
    urls = np.full(n, None, dtype=object)
    if alive is None:
        alive = np.ones(n, dtype=bool)

    is_abs = r.str.startswith(("http://", "https://"), na=False).to_numpy(bool)
    m_abs = alive & is_abs
    urls[m_abs] = r.to_numpy(object)[m_abs]

    b_ok = b.notna().to_numpy(bool)
    b_http = b.str.startswith(("http://", "https://"), na=False).to_numpy(bool)
    # protocol-relative fast path REQUIRES a non-empty authority ('//' with
    # nothing — or a '/', '?', '#' — after it is treated by CPython's
    # urljoin as an empty/path reference, not an authority; hypothesis
    # found '//' diverging). Any other '//'-prefixed ref is excluded from
    # BOTH fast paths and falls to the urljoin remainder loop.
    starts_dslash = r.str.startswith("//", na=False).to_numpy(bool)
    is_pr = r.str.match(r"//[^/?#]", na=False).to_numpy(bool) & ~is_abs
    m_pr = alive & is_pr & b_ok & b_http
    if m_pr.any():
        scheme = (
            b.str.startswith("https://", na=False)
            .map({True: "https:", False: "http:"})
        )
        vals = scheme + r
        urls[m_pr] = vals.where(vals.notna(), None).to_numpy(object)[m_pr]

    is_pa = r.str.startswith("/", na=False).to_numpy(bool) & ~starts_dslash & ~is_abs
    m_pa = alive & is_pa & b_ok
    if m_pa.any():
        prefix = b.str.extract(r"^(https?://[^/?#]*)", expand=False)
        vals = prefix + r
        urls[m_pa] = vals.where(vals.notna(), None).to_numpy(object)[m_pa]

    # sibling / dotted relatives: anything left that the concat grammar can
    # place — no leading '/', '?' or '#', no scheme-colon first segment, and
    # no '//' in ref or base path (CPython's urljoin collapses empty
    # segments in RELATIVE merges — a quirk the oracle inherits, so those
    # rows take the urljoin loop to stay bit-compatible)
    plain = (
        alive
        & b_ok
        & ~is_abs
        & ~is_pr
        & ~is_pa
        & (r.str.len() > 0).to_numpy(bool)
        & ~r.str.contains(r"^[^/]*:", regex=True, na=False).to_numpy(bool)
        & ~r.str.startswith(("?", "#"), na=False).to_numpy(bool)
        & ~r.str.contains("//", regex=False, na=False).to_numpy(bool)
        & (b.str.count("//").astype("float64").fillna(0) <= 1).to_numpy(bool)
    )
    if plain.any():
        dirp = b.str.extract(r"^(https?://[^/?#]*(?:[^?#]*/)?)", expand=False)
        dirp = dirp.where(dirp.str.endswith("/", na=False) | dirp.isna(), dirp + "/")
        vals = dirp + r
        urls[plain] = vals.where(vals.notna(), None).to_numpy(object)[plain]

    done = m_abs | m_pr | m_pa | plain
    for i in np.nonzero(alive & ~done)[0]:
        urls[i] = resolve_url(b.iloc[i], r.iloc[i])
    return urls


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
