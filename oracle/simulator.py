"""Pure-Python crawl oracle — the reference stand-in (SURVEY.md §6.2.3).

Implements SPEC.md round semantics with plain dicts and sorts, completely
independently of the Spark engine's relational formulation: no windows, no
joins, no salting, no Bloom filter — per host it literally sorts and slices
the pending list, and the seen set is an exact Python dict. If the engine's
salted two-phase windows, broadcast joins, Bloom-prefiltered anti-join and
snapshot plumbing are correct, its crawl order and final seen set match
this simulator bit-for-bit (tests/test_equality.py).

Shared with the engine (environment / pure definitions, NOT the system
under test): crawlspark.urlnorm (canonical-form definition),
crawlspark.robots (rule fixtures + longest-match predicate),
crawlspark.fetch_spec (the simulated web), crawlspark.xxh64
(Spark-compatible hashing).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from crawlspark import fetch_spec as fs
from crawlspark import urlnorm
from crawlspark.config import CrawlConfig
from crawlspark.robots import allowed as robots_allowed
from crawlspark.robots import rules_for_host
from crawlspark.textops import url_quality_keep_py
from crawlspark.xxh64 import hash_str


@dataclass
class Entry:
    url: str
    url_hash: int
    host: str
    host_hash: int
    priority: int
    crawl_depth: int
    discovered_round: int
    not_before_round: int


@dataclass
class OracleResult:
    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)  # (round, seq, url)
    seen: dict[int, str] = field(default_factory=dict)  # url_hash -> url
    docs: list[tuple[str, str, int, int, list[dict] | None]] = field(default_factory=list)
    frontier_by_round: dict[int, list[Entry]] = field(default_factory=dict)
    rounds: list[dict] = field(default_factory=list)
    # captures of the FINAL simulated round (fixture tables for the
    # driver-contract queries, fixtures.py):
    last_round: int = 0
    last_seen_before: dict[int, str] = field(default_factory=dict)
    last_selected: list[tuple[Entry, int]] = field(default_factory=list)  # (entry, rank)
    last_candidates_raw: list[Entry] = field(default_factory=list)  # pre-A2-dedup
    last_candidates: list[Entry] = field(default_factory=list)  # post-A2, pre-seen-filter
    content_seen: dict[int, str] = field(default_factory=dict)  # fingerprint -> first url
    # final recrawl_state mirror (cfg.recrawl_every): url_hash -> record
    recrawl_state: dict[int, dict] = field(default_factory=dict)


def _prep_url(raw: str, cfg: CrawlConfig) -> tuple[str, int, str, int] | None:
    """canon → validity → (url, url_hash, host, host_hash); None if dropped."""
    c = urlnorm.canon_url(raw)
    if c is None or not urlnorm.is_valid_url(c, cfg.max_url_len):
        return None
    host = urlnorm.host_of(c)
    if not host:
        return None
    return c, hash_str(c), host, hash_str(host)


def _robots_ok(url: str, host: str) -> bool:
    allow, disallow, _ = rules_for_host(host)
    return robots_allowed(urlnorm.path_of(url), allow, disallow)


def _host_budget(host: str, cfg: CrawlConfig) -> tuple[int, int]:
    _, _, delay = rules_for_host(host)
    b = max(1, cfg.max_fetches_per_host_per_round // delay)
    return b, delay


def simulate(
    seed_urls: list[str],
    cfg: CrawlConfig = CrawlConfig(),
    spec: fs.FetchSpec = fs.DEFAULT_SPEC,
    max_rounds: int = 5,
    sitemap_xml: list[tuple[str, str]] | None = None,
) -> OracleResult:
    res = OracleResult()
    frontier: dict[int, Entry] = {}
    # adaptive politeness multipliers (host_hash -> mult), SPEC: a host whose
    # fetched docs in a round are >=50% non-200 doubles its mult (capped at
    # cfg.adaptive_max_mult); an error-free round halves it; unfetched hosts
    # keep theirs. budget_eff = max(1, base_budget // mult); deferral delay
    # stretches to delay*mult. No-op unless cfg.adaptive_politeness.
    mult: dict[int, int] = {}
    # transient-failure retry queue (cfg.fetch_retries): url_hash ->
    # (Entry, attempts so far) — separate from the frontier, exactly like
    # the engine's retry_queue table (round.py)
    retry_q: dict[int, tuple[Entry, int]] = {}
    # per-host cumulative seen-page counts (cfg.host_page_quota): the
    # engine's append-only host_counts table as one dict
    host_counts: dict[int, int] = {}
    # closed-loop recrawl state (cfg.recrawl_every): url_hash -> record,
    # mirroring the engine's recrawl_state table (sitemaps.
    # recrawl_state_merge / recrawl_due rules verbatim)
    rc_state: dict[int, dict] = {}

    # --- init (SPEC.md Init) ------------------------------------------------
    # seed intake: explicit seeds at priority 0, plus (opt-in) sitemap
    # <loc> entries at their quantized sitemap priority — both through the
    # IDENTICAL prep/robots/min-dedup, mirroring round.init_crawl's union.
    # parse_entries_py/seed_priority_py are shared environment definitions
    # (the relational parse is independently DuckDB-verified).
    from crawlspark.sitemaps import parse_entries_py, seed_priority_py

    seed_entries: list[tuple[str, int]] = [(raw, 0) for raw in seed_urls]
    for _sm_host, xml in sitemap_xml or ():
        for loc, _lm, _cf, pr in parse_entries_py(xml):
            seed_entries.append((loc, seed_priority_py(pr)))

    cand: dict[int, Entry] = {}
    for raw, prio in seed_entries:
        p = _prep_url(raw, cfg)
        if p is None:
            continue
        url, uh, host, hh = p
        if not _robots_ok(url, host):
            continue
        e = Entry(url, uh, host, hh, prio, 0, 0, 0)
        old = cand.get(uh)
        if old is None or (e.priority, e.crawl_depth, e.url) < (
            old.priority,
            old.crawl_depth,
            old.url,
        ):
            cand[uh] = e
    frontier = dict(cand)
    if cfg.host_page_quota:
        # seeds are exempt from the cap but count toward usage
        for e in frontier.values():
            host_counts[e.host_hash] = host_counts.get(e.host_hash, 0) + 1
    res.seen = {uh: e.url for uh, e in frontier.items()}
    res.frontier_by_round[0] = sorted((replace(e) for e in frontier.values()), key=lambda e: (e.url_hash,))

    # --- rounds -------------------------------------------------------------
    for r in range(1, max_rounds + 1):
        res.last_round = r
        res.last_seen_before = dict(res.seen)
        eligible = [e for e in frontier.values() if e.not_before_round <= r]
        if cfg.fetch_retries:
            # retry-queue rows compete in the normal scheduler
            eligible += [e for e, _k in retry_q.values() if e.not_before_round <= r]
        # per-host top-B_h by (priority, depth, url_hash, url)  [SPEC §3]
        by_host: dict[int, list[Entry]] = {}
        for e in eligible:
            by_host.setdefault(e.host_hash, []).append(e)
        selected: list[tuple[Entry, int]] = []  # (entry, per-host rank)
        if cfg.priority_aging_every:
            # starvation freedom: effective priority improves by 1 per
            # aging interval waited since discovery (round.py mirrors)
            k_age = cfg.priority_aging_every

            def _prio(e: Entry) -> int:
                return e.priority - (r - e.discovered_round) // k_age
        else:
            def _prio(e: Entry) -> int:
                return e.priority
        for hh, entries in by_host.items():
            entries.sort(key=lambda e: (_prio(e), e.crawl_depth, e.url_hash, e.url))
            b, _ = _host_budget(entries[0].host, cfg)
            if cfg.adaptive_politeness:
                b = max(1, b // mult.get(hh, 1))
            for i, e in enumerate(entries[:b]):
                selected.append((e, i + 1))
        # per-IP politeness cap (opt-in cfg.ip_politeness_groups): mirror
        # rank.ip_cap — group = xxh64(str(host_hash) + '#ip') mod N, each
        # group keeps its ip_budget best rows in (rank, host_hash, url)
        # order; dropped rows stay in the frontier (normal deferral)
        n_ip_capped = 0
        if cfg.ip_politeness_groups:
            from crawlspark.xxh64 import hash_str as _hs

            grouped: dict[int, list[tuple[Entry, int]]] = {}
            for e, rk in selected:
                g = _hs(f"{e.host_hash}#ip") % cfg.ip_politeness_groups
                grouped.setdefault(g, []).append((e, rk))
            kept: list[tuple[Entry, int]] = []
            for g, lst in grouped.items():
                lst.sort(key=lambda t: (t[1], t[0].host_hash, t[0].url))
                kept.extend(lst[: cfg.ip_budget])
            n_ip_capped = len(selected) - len(kept)
            selected = kept
        # global cap K in emission order (boost?, host_hash, rank, url)
        # [SPEC §4]; boost = opt-in host-priority table (config.host_boosts,
        # lower first, unlisted hosts 0) — mirrors rank.attach_boosts
        boosts = dict(cfg.host_boosts or ())
        selected.sort(
            key=lambda t: (boosts.get(t[0].host, 0), t[0].host_hash, t[1], t[0].url)
        )
        selected = selected[: cfg.round_capacity]
        for seq, (e, _rank) in enumerate(selected):
            res.crawl_order.append((r, seq, e.url))

        res.last_selected = [(replace(e), rk) for e, rk in selected]

        # fetch + parse  [SPEC §5-6]
        raw_cands: list[Entry] = []
        new_cand: dict[int, Entry] = {}
        fetch_stats: dict[int, list[int]] = {}  # host_hash -> [n, err]
        uq_filtered: set[int] = set()  # distinct url_hashes dropped by F6b
        fetched: list[tuple[Entry, int, list[dict] | None]] = []
        n_not_modified = 0
        for e, _rank in selected:
            status, spans = fs.simulate_fetch(e.url, spec, r)
            # conditional refetch (opt-in cfg.conditional_fetch): a 200
            # whose fingerprint matches the stored recrawl_state validator
            # becomes a 304 with an EMPTY span list BEFORE the docs row,
            # stats, dedup, and parse see it (round.py mirrors)
            if cfg.conditional_fetch and status == 200:
                srow = rc_state.get(e.url_hash)
                if srow is not None and srow["fp"] == fs.content_fingerprint_py(
                    spans
                ):
                    status, spans = 304, []
                    n_not_modified += 1
            res.docs.append((fs.doc_id_of(e.url_hash), e.url, r, status, spans))
            s = fetch_stats.setdefault(e.host_hash, [0, 0])
            s[0] += 1
            if status >= 400:
                s[1] += 1
            fetched.append((e, status, spans))
        # recrawl state merge (opt-in cfg.recrawl_every): mirror
        # sitemaps.recrawl_state_merge — any fetch stamps the visit; a 200
        # accrues a changed/unchanged pair vs the stored fingerprint,
        # updates it, and clears the enqueued latch; first-200 inserts a
        # fresh row; failed first sightings are not tracked
        if cfg.recrawl_every:
            for e, status, spans in fetched:
                srow = rc_state.get(e.url_hash)
                if srow is not None:
                    srow["last"] = r
                    if status == 200:
                        fp = fs.content_fingerprint_py(spans)
                        if fp != srow["fp"]:
                            srow["n_changed"] += 1
                        else:
                            srow["n_unchanged"] += 1
                        srow["fp"] = fp
                        srow["enq"] = None
                    elif status == 304:
                        # revalidated: unchanged pair, fingerprint keeps,
                        # latch clears (a 304 == 200-unchanged for state)
                        srow["n_unchanged"] += 1
                        srow["enq"] = None
                elif status == 200:
                    rc_state[e.url_hash] = {
                        "url": e.url,
                        "host": e.host,
                        "hh": e.host_hash,
                        "prio": e.priority,
                        "depth": e.crawl_depth,
                        "last": r,
                        "fp": fs.content_fingerprint_py(spans),
                        "n_changed": 0,
                        "n_unchanged": 0,
                        "enq": None,
                    }
        # content-seen dedup (opt-in): suppress link extraction for docs
        # whose span fingerprint was sighted in an earlier round or, this
        # round, under a lexicographically smaller URL (round.py mirrors)
        content_dups = 0
        suppressed: set[str] = set()
        if cfg.content_dedup:
            win: dict[int, str] = {}
            for e, status, spans in fetched:
                if status == 200:
                    d = fs.content_fingerprint_py(spans)
                    if d not in win or e.url < win[d]:
                        win[d] = e.url
            for e, status, spans in fetched:
                if status != 200:
                    continue
                d = fs.content_fingerprint_py(spans)
                if d in res.content_seen or e.url != win[d]:
                    suppressed.add(e.url)
                    content_dups += 1
            for d, u in win.items():
                res.content_seen.setdefault(d, u)
        for e, status, spans in fetched:
            if status not in (200, 301) or not spans:
                continue
            if e.url in suppressed:
                continue
            for s in spans:
                if s["kind"] not in ("link", "image", "video", "location"):
                    continue
                ref = s["media_ref"]
                if not ref:
                    continue
                target = urlnorm.resolve_url(e.url, ref)
                p = _prep_url(target, cfg) if target else None
                if p is None:
                    continue
                url, uh, host, hh = p
                # a redirect target is the SAME resource: depth/priority
                # inherit unchanged (candidates.py applies the same rule)
                if s["kind"] == "location":
                    depth = e.crawl_depth
                    prio = e.priority
                else:
                    depth = e.crawl_depth + 1
                    prio = e.priority + (1 if s["kind"] == "link" else 2)
                if depth > cfg.max_depth:
                    continue
                if not _robots_ok(url, host):
                    continue
                if cfg.url_quality_filter and not url_quality_keep_py(url):
                    # opt-in pre-fetch URL policy filter — the engine drops
                    # these after candidate dedup, before the seen anti-join
                    # (round.py); the predicate is constant per canonical
                    # URL so filtering here (pre-dedup) is equivalent, and
                    # the engine's Observation counts DISTINCT dropped URLs
                    uq_filtered.add(uh)
                    continue
                raw_cands.append(Entry(url, uh, host, hh, prio, depth, r, r + 1))
                old = new_cand.get(uh)
                if old is None:
                    new_cand[uh] = Entry(url, uh, host, hh, prio, depth, r, r + 1)
                else:
                    # A2 dedup: min url / min priority / min depth
                    old.priority = min(old.priority, prio)
                    old.crawl_depth = min(old.crawl_depth, depth)
                    old.url = min(old.url, url)

        res.last_candidates_raw = raw_cands
        res.last_candidates = [replace(e) for e in new_cand.values()]
        new_entries = {uh: e for uh, e in new_cand.items() if uh not in res.seen}
        # per-host page quota (opt-in): admission-rank this round's new
        # entries per host, keep quota - used (round.py mirrors)
        quota_dropped = 0
        if cfg.host_page_quota:
            by_h2: dict[int, list[Entry]] = {}
            for e in new_entries.values():
                by_h2.setdefault(e.host_hash, []).append(e)
            kept: dict[int, Entry] = {}
            for hh2, entries in by_h2.items():
                entries.sort(
                    key=lambda e: (e.priority, e.crawl_depth, e.url_hash, e.url)
                )
                room = cfg.host_page_quota - host_counts.get(hh2, 0)
                for e in entries[: max(room, 0)]:
                    kept[e.url_hash] = e
                quota_dropped += max(len(entries) - max(room, 0), 0)
                host_counts[hh2] = host_counts.get(hh2, 0) + min(
                    max(room, 0), len(entries)
                )
            new_entries = kept

        # advance  [SPEC §10]
        sel_hashes = {e.url_hash for e, _ in selected}
        next_frontier: dict[int, Entry] = {}
        for uh, e in frontier.items():
            if uh in sel_hashes:
                continue
            if e.not_before_round <= r:
                _, delay = _host_budget(e.host, cfg)
                if cfg.adaptive_politeness:
                    delay *= mult.get(e.host_hash, 1)
                e.not_before_round = r + delay
            next_frontier[uh] = e
        if cfg.fetch_retries:
            # queue advance mirrors round.py: non-selected eligible rows
            # bump like deferral (pre-update mult), 503s re-queue with
            # exponential backoff up to cfg.fetch_retries attempts
            next_q: dict[int, tuple[Entry, int]] = {}
            for uh, (e, k) in retry_q.items():
                if uh in sel_hashes:
                    continue
                if e.not_before_round <= r:
                    _, delay = _host_budget(e.host, cfg)
                    if cfg.adaptive_politeness:
                        delay *= mult.get(e.host_hash, 1)
                    e.not_before_round = r + delay
                next_q[uh] = (e, k)
            for e, status, _spans in fetched:
                if status != 503:
                    continue
                k = retry_q.get(e.url_hash, (None, 0))[1]
                if k < cfg.fetch_retries:
                    e2 = replace(e, not_before_round=r + (1 << (k + 1)))
                    next_q[e.url_hash] = (e2, k + 1)
            retry_q = next_q
        if cfg.adaptive_politeness:
            for hh, (n, err) in fetch_stats.items():
                m = mult.get(hh, 1)
                if err * 2 >= n:
                    mult[hh] = min(cfg.adaptive_max_mult, m * 2)
                elif err == 0:
                    mult[hh] = max(1, m // 2)
        for uh, e in new_entries.items():
            res.seen[uh] = e.url
            next_frontier[uh] = e
        # recrawl re-enqueue (opt-in, cadence rounds): mirror
        # sitemaps.recrawl_due — per-host observed-class interval in ×4
        # fixed point; due rows latch enqueued_round and re-enter the
        # frontier with original priority/depth, discovered this round.
        # Seen set untouched (a refresh is not a discovery).
        n_recrawled = 0
        if cfg.recrawl_every and r % cfg.recrawl_every == 0:
            from crawlspark.sitemaps import (
                CHANGE_RATE_CLASSES,
                RECRAWL_CLASS_MULT4,
            )

            multmap = dict(RECRAWL_CLASS_MULT4)
            agg: dict[int, list[int]] = {}
            for srow in rc_state.values():
                a = agg.setdefault(srow["hh"], [0, 0])
                a[0] += srow["n_changed"]
                a[1] += srow["n_unchanged"]

            def _mult4(hh: int) -> int:
                ch, un = agg[hh]
                if ch + un == 0:
                    return multmap["weekly"]
                rate = ch / (ch + un)
                for lo, name in CHANGE_RATE_CLASSES[:-1]:
                    if rate >= lo:
                        return multmap[name]
                return multmap[CHANGE_RATE_CLASSES[-1][1]]

            for uh, srow in rc_state.items():
                if srow["enq"] is not None:
                    continue
                if 4 * (r - srow["last"]) >= cfg.recrawl_interval * _mult4(
                    srow["hh"]
                ):
                    srow["enq"] = r
                    next_frontier[uh] = Entry(
                        srow["url"], uh, srow["host"], srow["hh"],
                        srow["prio"], srow["depth"], r, r + 1,
                    )
                    n_recrawled += 1
        frontier = next_frontier
        res.frontier_by_round[r] = sorted((replace(e) for e in frontier.values()), key=lambda e: (e.url_hash,))
        round_info = {
            "round": r,
            "selected": len(selected),
            "new": len(new_entries),
            "frontier": len(frontier),
        }
        if cfg.url_quality_filter:
            round_info["url_filtered"] = len(uq_filtered)
        if cfg.content_dedup:
            round_info["content_dups"] = content_dups
        if cfg.fetch_retries:
            round_info["retry_queue"] = len(retry_q)
        if cfg.host_page_quota:
            round_info["quota_dropped"] = quota_dropped
        if cfg.recrawl_every:
            round_info["recrawled"] = n_recrawled
            # tracked-row counter (engine: resolve_recrawl_delta 'auto'
            # input) — the mirror is simply the state-table population
            round_info["recrawl_rows"] = len(rc_state)
        if cfg.conditional_fetch:
            round_info["not_modified"] = n_not_modified
        if cfg.ip_politeness_groups:
            round_info["ip_capped"] = n_ip_capped
        res.rounds.append(round_info)
        if not frontier and not retry_q:
            break
    res.recrawl_state = rc_state
    return res


def seen_digest(res: OracleResult) -> tuple[int, int]:
    """(count, bit_xor of url_hash) — order-insensitive digest (A6)."""
    x = 0
    for uh in res.seen:
        x ^= uh & 0xFFFFFFFFFFFFFFFF
    return len(res.seen), x
