"""Deterministic fetch simulator — the sandbox's "web" (SURVEY.md §3.1 S8).

Heroshi's io-worker performs the real HTTP fetch (Go, stdin/stdout JSON
lines — recalled, SURVEY.md §0). No network exists here, so the fetch is a
pure function of the canonical URL: same URL ⇒ same status and same
interleaved text+media span array, on every run, at every parallelism
level. Both the Spark engine (inside the U-5 ``applyInPandas`` fetch stage)
and the pure-Python oracle import THIS module — it is the simulated
environment, not the system under test; the scheduling/dedup logic that the
equality tests exercise is implemented independently on each side.

Production swap-in: replace ``simulate_fetch`` with an async HTTP client
inside the same ``applyInPandas`` batch function; everything downstream
(span schema, parse, dedup, frontier update) is unchanged.

Spans follow the binding input shape (BASELINE.json:15):
``array<struct<kind:string, text:string, media_ref:string, offset:int>>``
with ``offset`` enumerating span order 0..n-1 — span order is data.

Link-universe shape (drives the crawl dynamics the tests need):
- ``n_hosts`` hosts ``h{k}.example``; hosts h0/h1 absorb ~50% of all link
  targets (hot-host skew fixture, FIXTURES.md §1 / SURVEY.md §8.M5).
- ~20% of refs are path-absolute (``/p/…``), ~8% dotted-relative
  (``../p/…``), rest absolute — exercises link resolution.
- ~5% of link paths hit ``/private/…`` (robots fixture disallows these on
  some hosts); a finite ``path_space`` makes the URL universe closed so
  dedup terminates the crawl.
"""

from __future__ import annotations

from dataclasses import dataclass

from .xxh64 import hash_str

KINDS = ("text", "link", "image", "video")


@dataclass(frozen=True)
class FetchSpec:
    n_hosts: int = 50
    path_space: int = 2000
    max_spans: int = 8
    not_found_mod: int = 23  # 1/23 of URLs 404
    # opt-in URL-shape realism for exercising the pre-fetch quality filter
    # (CrawlConfig.url_quality_filter): image/video refs get media
    # extensions and ~1/17 of links a blocklisted path prefix. Off by
    # default so every existing fixture/digest stays byte-identical.
    media_exts: bool = False
    # opt-in HTTP redirects: when > 0, ~1/redirect_mod of URLs return 301
    # with a single `location` span carrying the absolute target (which may
    # itself redirect — chains and the occasional loop emerge organically
    # from the hash universe). 0 = off, so every existing fixture/digest
    # stays byte-identical.
    redirect_mod: int = 0
    # opt-in content mirrors: when > 0, ~1/mirror_mod of status-200 URLs
    # draw their span array from a shared content key (mirror_space
    # distinct keys) instead of the URL itself, so byte-identical documents
    # exist under different URLs — the universe CrawlConfig.content_dedup
    # exists for. 0 = off (byte-identical to the pre-flag universe).
    mirror_mod: int = 0
    mirror_space: int = 200
    # opt-in content churn: when > 0, ~1/change_mod of status-200 URLs
    # gain a round-keyed suffix on span 0's text — refetching a churning
    # URL in a different round yields a different content fingerprint
    # (a `changed` pair for CrawlConfig.recrawl_every's observed-class
    # estimator) while static URLs stay byte-identical. Only text mutates:
    # media_refs (and hence link extraction / crawl expansion) are
    # untouched. Round-independent callers (round_=None) never see churn.
    # 0 = off (byte-identical to the pre-flag universe).
    change_mod: int = 0
    # opt-in transient fetch errors: when > 0, ~1/error_mod of (url, round)
    # draws return 503 — the SAME url can fail in one round and succeed in
    # a later one, which is exactly what CrawlConfig.fetch_retries
    # re-schedules for. Round-independent callers (round_=None) never see
    # a 503. 0 = off (byte-identical to the pre-flag universe).
    error_mod: int = 0


DEFAULT_SPEC = FetchSpec()


def redirect_of(url: str, spec: FetchSpec = DEFAULT_SPEC) -> str | None:
    """Absolute redirect target for `url`, or None. Pure: the redirect
    decision and target are functions of the URL alone, so a target may
    itself redirect — chains arise naturally. Decided BEFORE the 404 draw
    (a redirecting URL is never a 404)."""
    if spec.redirect_mod and hash_str(url + "#redir") % spec.redirect_mod == 0:
        k = hash_str(url + "#rt") % spec.n_hosts
        pid = hash_str(url + "#rp") % spec.path_space
        return f"http://h{k}.example/p/{pid}"
    return None


def status_of(
    url: str, spec: FetchSpec = DEFAULT_SPEC, round_: int | None = None
) -> int:
    if redirect_of(url, spec) is not None:
        return 301
    if (
        spec.error_mod
        and round_ is not None
        and hash_str(f"{url}#err{round_}") % spec.error_mod == 0
    ):
        return 503
    return 404 if hash_str(url + "#fetch") % spec.not_found_mod == 0 else 200


def _target_host(url: str, j: int, spec: FetchSpec) -> int:
    if hash_str(f"{url}#skew{j}") % 2 == 0:
        return hash_str(f"{url}#hot{j}") % 2  # h0/h1 absorb half the links
    return hash_str(f"{url}#h{j}") % spec.n_hosts


def span_at(url: str, j: int, spec: FetchSpec = DEFAULT_SPEC) -> dict:
    """Span j of the document at `url` — pure, order-indexed by `offset`."""
    hj = hash_str(f"{url}#s{j}")
    r = hj % 100
    if r < 60:
        kind = "text"
    elif r < 85:
        kind = "link"
    elif r < 95:
        kind = "image"
    else:
        kind = "video"
    if kind == "text":
        return {"kind": "text", "text": f"t{hj % 100000}", "media_ref": None, "offset": j}
    pid = hash_str(f"{url}#p{j}") % spec.path_space
    k = _target_host(url, j, spec)
    rel = hash_str(f"{url}#r{j}") % 100
    if hash_str(f"{url}#priv{j}") % 20 == 0:
        path = f"/private/{pid}"
    else:
        path = f"/p/{pid}"
    if spec.media_exts:
        if kind == "image":
            path += ".jpg"
        elif kind == "video":
            path += ".mp4"
        elif kind == "link" and hash_str(f"{url}#bl{j}") % 17 == 0:
            path = "/casino" + path
    if rel < 20:
        ref = path  # path-absolute: resolves against the doc's own host
    elif rel < 28:
        ref = f"..{path}"  # dotted relative
    else:
        ref = f"http://h{k}.example{path}"
    text = f"a{hj % 1000}" if kind == "link" else ""
    return {"kind": kind, "text": text, "media_ref": ref, "offset": j}


def mirror_seed_of(url: str, spec: FetchSpec = DEFAULT_SPEC) -> str | None:
    """Shared content key when `url` is a mirror, else None. Mirrors of the
    same key produce byte-identical span arrays (relative link refs then
    resolve against each mirror's own host, as real relative-linked mirror
    sites do)."""
    if spec.mirror_mod and hash_str(url + "#mir") % spec.mirror_mod == 0:
        return f"mirror:{hash_str(url + '#mkey') % spec.mirror_space}"
    return None


def content_fingerprint_py(spans: list[dict]) -> int:
    """xxh64 content digest of a span array — bit-equal to the engine's
    parse.content_fingerprint Column (same field/record separators, same
    None→'' coalescing, Spark default seed)."""
    parts = [
        f"{s['kind']}\x1e{s['text'] or ''}\x1e{s['media_ref'] or ''}\x1e{s['offset']}"
        for s in spans
    ]
    return hash_str("\x1f".join(parts))


def simulate_fetch(
    url: str, spec: FetchSpec = DEFAULT_SPEC, round_: int | None = None
) -> tuple[int, list[dict] | None]:
    """(status, spans) for a canonical URL. 404/503 ⇒ spans is None; 301 ⇒
    one `location` span whose media_ref is the absolute redirect target.
    `round_` only matters under error_mod (transient 503 draws)."""
    status = status_of(url, spec, round_)
    if status == 301:
        loc = redirect_of(url, spec)
        return status, [
            {"kind": "location", "text": "", "media_ref": loc, "offset": 0}
        ]
    if status != 200:
        return status, None
    seed = mirror_seed_of(url, spec) or url
    n = 1 + hash_str(seed + "#n") % spec.max_spans
    spans = [span_at(seed, j, spec) for j in range(n)]
    if (
        spec.change_mod
        and round_ is not None
        and hash_str(seed + "#chg") % spec.change_mod == 0
    ):
        sp = dict(spans[0])
        sp["text"] = (sp["text"] or "") + f" v{round_}"
        spans = [sp] + spans[1:]
    return status, spans


def doc_id_of(url_hash: int) -> str:
    return f"d{url_hash & 0xFFFFFFFFFFFFFFFF:016x}"
