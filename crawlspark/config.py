"""Crawl configuration (SPEC.md `Config`; defaults from FIXTURES.md §4).

Everything is round-slot / count based — no wall-clock anywhere — so runs
are bit-reproducible across parallelism levels (SPEC.md, SURVEY.md §2
determinism rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class CrawlConfig:
    # politeness / scheduling
    max_fetches_per_host_per_round: int = 4   # B
    max_depth: int = 6                        # D
    round_capacity: int | None = 2000         # K (global per-round cap); None = uncapped
    hot_threshold: int = 64                   # H (pending count that triggers salting)
    max_salts: int = 16
    # seen-set layout
    n_buckets: int = 64                       # P (4096 at production scale)
    bloom_fpp: float = 0.01
    bloom_capacity_per_bucket: int = 1 << 16  # initial per-bucket capacity; grows by rebuild
    # hashing
    hash_seed: int = 42                       # Spark xxhash64 default — do not change
    salt_seed: int = 7
    # url validity
    max_url_len: int = 2048
    allowed_schemes: tuple[str, ...] = ("http", "https")
    # engine knobs (no effect on semantics)
    shuffle_partitions: int = 32
    use_bloom_prefilter: bool = True
    # Bloom broadcast slicing: per round only CHANGED buckets' partial blobs
    # ship as a delta broadcast; the chain re-consolidates into one full
    # broadcast every N deltas (and on any bucket rebuild). At the 10^10
    # design point this turns ~1.2 GB/round of re-broadcast into
    # O(changed buckets)/round.
    bloom_rebroadcast_every: int = 8
    # WHERE the seen-set Bloom state lives:
    # - 'broadcast': driver-side BloomRegistry, probed via a sliced
    #   broadcast chain inside the fused candidate pass (no extra shuffle;
    #   right while the total payload fits comfortably on the driver);
    # - 'relational': EXECUTOR-side state — blobs are parquet rows (base +
    #   per-round deltas), maintained by distributed groupBy/applyInPandas
    #   merges and probed by a co-partitioned cogroup on bucket. No driver
    #   registry, no sc.broadcast of any blob, ever: the 10^10 design
    #   point's mode (at 4096 buckets × ~290 KB the driver OR/re-broadcast
    #   cycle is a memory + serialization chokepoint). Costs one extra
    #   O(batch) shuffle per round — measured at PARITY with broadcast at
    #   the 1M-host tier (BENCH/BASELINE.md), digest-equality tested.
    # - 'auto' (DEFAULT): the projected payload n_buckets × m/8 bytes is
    #   computable exactly from (capacity, fpp, P) at init; above
    #   bloom_broadcast_max_bytes the engine resolves to relational.
    #   At the 10^10 point (4096 × ~290 KB ≈ 1.2 GB) → relational;
    #   at test scale (64 × ~78 KB ≈ 5 MB) → broadcast.
    # Compaction cadence in relational mode reuses bloom_rebroadcast_every.
    bloom_mode: str = "auto"
    bloom_broadcast_max_bytes: int = 64 << 20
    # robots rules as a relational broadcast-join + vectorized UDF filter
    # instead of a driver-resident python dict in the fused pass — the
    # web-scale mode (millions of rule-bearing hosts don't fit one pickled
    # closure). Identical output (digest-equality tested). False means
    # AUTO: the engine counts rule-bearing hosts at init/resume and flips
    # to relational above robots_relational_threshold, so the scale-safe
    # path engages without a config change. True forces relational.
    robots_relational: bool = False
    # rule-bearing host count above which dict mode stops being sane as a
    # pickled closure (~100 B/host → ~10 MB broadcast at the threshold)
    robots_relational_threshold: int = 100_000
    fetch_arrow: bool = False
    # opt-in pre-fetch URL quality filter (C4-style policy): drop candidate
    # links whose canonical URL is path-blocklisted or carries a media
    # extension (textops.url_quality classes) BEFORE the seen anti-join —
    # they never enter seen/frontier, never get fetched. OFF by default
    # because it changes the crawl's URL universe (a policy choice, not an
    # engine knob); the pure-Python oracle mirrors it at the same stage
    # (oracle/simulator.py) and the filtered count lands in lineage as
    # stage='url_filtered' plus the round_info counter.
    url_quality_filter: bool = False
    # opt-in content-seen dedup (Heritrix-style content-digest test): docs
    # whose span-array fingerprint (parse.content_fingerprint) was already
    # seen — in a previous round, or this round under a lexicographically
    # smaller URL — are still RECORDED in the documents sink but their
    # links are never extracted, so mirror families expand the frontier
    # exactly once. State = one append-only (content_hash, url) row per
    # first sighting; per-round cost = one map-side-combinable aggregate +
    # one anti-join keyed on the digest (no broadcasts). Mirrored in the
    # oracle at the same stage; suppressed count lands in lineage as
    # stage='content_dups' plus the round_info counter. OFF by default
    # (changes the crawl's expansion, a policy choice).
    content_dedup: bool = False
    # opt-in transient-failure retries (FetchSpec.error_mod plants the
    # 503s): a 503'd URL re-enters scheduling after an exponential backoff
    # (2^attempt rounds), up to this many attempts, then is abandoned (it
    # stays in seen either way, so it is never re-discovered). Retry state
    # lives in its own small per-round `retry_queue` table — O(recent
    # failures), rewritten whole each round — NOT in the frontier, so both
    # frontier engines (stored and delta) are untouched by the feature and
    # the delta chain's add/remove semantics never see a re-added hash.
    # Queue rows compete in the normal scheduler (budgets, politeness,
    # capacity). 0 = off (default path bit-identical). Oracle-mirrored.
    fetch_retries: int = 0
    # opt-in per-host page quota (Heritrix maxDocuments-style budget, as
    # frontier ADMISSION control — the variant that bounds frontier growth
    # at scale): once a host has accumulated this many seen pages, further
    # discovered candidates for it are dropped (deterministically: each
    # round's new rows rank per host by (priority, depth, url_hash, url)
    # and only quota-remaining survive). Seeds are operator-chosen and
    # exempt from the cap but count toward usage. State = append-only
    # per-round (host_hash, n) deltas summed at read — O(hosts), two
    # orders below the frontier. None = off (default path untouched).
    # Oracle-mirrored; dropped count in lineage + round_info.
    host_page_quota: int | None = None
    # opt-in priority aging (starvation freedom): every K rounds a pending
    # URL has waited since discovery improves its EFFECTIVE scheduling
    # priority by 1 (lower = sooner), so budget-capped backlogs eventually
    # drain oldest-first instead of starving low-priority rows forever.
    # Transient `_aged` column in the scheduler only — the frontier stores
    # the base priority, so flipping the flag mid-crawl is resume-safe.
    # None = off (scheduling order byte-identical). Oracle-mirrored.
    priority_aging_every: int | None = None
    # opt-in host-priority boosts — the consumption side of the link-graph
    # signals (e.g. quantized offline PageRank from linkgraph.host_pagerank,
    # see linkgraph.pagerank_boosts): tuples of (host, boost), LOWER boost
    # schedules first (same ascending discipline as priority). Applied at
    # EMISSION only: the global capacity cap and the crawl-order sequence
    # sort by (boost, host_hash, rank, url), so under a round capacity the
    # important hosts win the budget and lead the fetch order. Within-host
    # order is provably untouched (a host-constant addend cannot reorder
    # URLs of the same host), and frontier/seen state never stores the
    # boost — flipping the flag mid-crawl is safe on resume. OFF (None)
    # keeps the crawl bit-equal to the boost-free oracle.
    host_boosts: tuple[tuple[str, int], ...] | None = None
    # opt-in closed-loop recrawl scheduling (Cho & Garcia-Molina refresh,
    # the OBSERVED-signal variant — sitemaps.recrawl_due): the engine keeps
    # a per-URL recrawl_state table (last_fetch_round, content fingerprint,
    # accumulated changed/unchanged refetch pairs) updated from every
    # round's fetches; every `recrawl_every` rounds, already-fetched URLs
    # whose age crosses their host's observed-changefreq interval are
    # RE-ENQUEUED into the frontier (original priority/depth,
    # discovered_round = the re-enqueue round) and then ride the normal
    # scheduler — politeness, budgets, capacity, retries — like any other
    # row. Seen set, bloom, and host quotas are untouched (the page was
    # already seen; a refresh is not a discovery). Interval = uniform
    # allocation (the paper's conclusion): recrawl_interval rounds scaled
    # by the host's CHANGE_RATE_CLASSES class in ×4 fixed-point integer
    # math (daily ½×, weekly 1×, monthly 4×, yearly 8×; no-evidence
    # default weekly) — cross-engine exact, no float thresholds on ages.
    # A URL re-enqueued but not yet successfully refetched is never
    # double-enqueued (enqueued_round latch, cleared on the next 200).
    # None = off: the default crawl is bit-identical and writes no state.
    # Oracle-mirrored (oracle/simulator.py); re-enqueued count lands in
    # round_info + lineage as stage='recrawled'.
    recrawl_every: int | None = None
    recrawl_interval: int = 4
    # opt-in conditional refetch (HTTP revalidation economy; requires
    # recrawl_every): a refetch whose content fingerprint equals the one
    # stored in recrawl_state is classified 304 Not Modified — the
    # documents row keeps status 304 with an EMPTY span array (nothing
    # re-stored, nothing re-parsed), and recrawl_state accrues the
    # unchanged pair + clears the enqueue latch exactly as a
    # 200-unchanged would (sitemaps.recrawl_state_merge). In the sandbox
    # the validator comparison runs on the simulated payload; with a real
    # fetcher the stored fingerprint rides the request as
    # If-None-Match/If-Modified-Since and the comparison happens
    # server-side — same seam where fetch_spec.simulate_fetch swaps out.
    # Only refetches can revalidate (the seen set blocks duplicate
    # first-fetches), so the flag is bit-neutral unless recrawl actually
    # re-enqueues. Count lands in round_info + lineage as
    # stage='not_modified'. Oracle-mirrored (oracle/simulator.py).
    conditional_fetch: bool = False
    # recrawl_state write engine (VERDICT r6 directive #4 — the state was
    # whole-rewritten every round, O(all URLs ever fetched) write
    # amplification once recrawl is on). 'auto' (default) mirrors the
    # frontier_delta discipline: below recrawl_delta_min_rows tracked rows
    # the stored engine's one columnar rewrite is cheaper than the delta
    # chain's merge-on-read resolve; above it only O(touched rows) may be
    # written per round. Delta rounds write a round-stamped
    # recrawl_state_delta (fetched + newly tracked + due-latched rows);
    # full states are BASE rounds (first write + every
    # compact_recrawl_every), and reads resolve latest-version-per-url_hash
    # — the Iceberg MERGE-INTO shape on the parquet engine
    # (SnapshotStore.read_recrawl). Both engines are run+resume bit-equal
    # (tests/test_recrawl_delta.py).
    recrawl_delta: bool | str = "auto"
    recrawl_delta_min_rows: int = 10_000_000
    compact_recrawl_every: int | None = 8
    # opt-in per-IP politeness (Heritrix queue-per-IP analog): virtual
    # hosting maps many hosts to one server, so per-host budgets alone
    # can still hammer a box. A deterministic resolver stub assigns each
    # host an IP group — xxhash64(str(host_hash) + '#ip') mod N, the
    # production swap point being a DNS-resolved (host_hash, ip_group)
    # table joined in its place — and AFTER per-host selection each group
    # keeps at most `ip_budget` rows per round, consumed best-rank-first
    # ACROSS hosts ((rank, host_hash, url) order: fair interleaving, no
    # single host starves its server neighbors). Rows the cap drops stay
    # in the frontier and take the normal deferral bump. None = off,
    # bit-identical default. Oracle-mirrored (oracle/simulator.py);
    # dropped count lands in round_info + lineage as stage='ip_capped'.
    ip_politeness_groups: int | None = None
    ip_budget: int = 4
    # adaptive politeness (heroshi-style backoff from observed server
    # behavior): a host whose fetched docs this round are >=50% errors gets
    # its delay multiplier doubled (budget shrinks, deferral stretches); an
    # error-free round halves it. Multiplier state is checkpointed per
    # round (host_state table) so resume is exact. Opt-in: the default
    # crawl stays bit-equal to the static-politeness oracle.
    adaptive_politeness: bool = False
    adaptive_max_mult: int = 8
    # frontier engine:
    # - True (delta): per-round frontier IO becomes O(batch) — removals
    #   (selected url_hashes) + additions (new rows) — instead of rewriting
    #   the whole frontier to bump not_before_round. Correct because with
    #   per-host-constant delay the deferral is DERIVABLE:
    #   eligible(r) ⇔ r ≥ nb₀ ∧ (r − nb₀) mod delay = 0 (a row re-offers
    #   every `delay` rounds until selected). Bases are re-materialized
    #   every compact_frontier_every rounds to bound read fan-in. Composes
    #   with adaptive_politeness via a sparse stored-exception table: only
    #   offers made at mult>1 (and rows already on an exception) persist a
    #   deferral row; everything else stays derived.
    # - False (stored): whole-frontier rewrite per round with stored
    #   not_before_round bumps — simpler, and FASTER while the frontier is
    #   small (the delta chain read has a fixed per-round cost that only
    #   amortizes once the avoided rewrite is large).
    # - 'auto' (DEFAULT): decide PER ROUND from the running frontier
    #   counter the manifest already carries: below frontier_delta_min_rows
    #   run a stored round (full rewrite, recorded as a frontier base so
    #   delta rounds can chain from it), above it run a delta round. The
    #   two round kinds interleave freely on one checkpoint and are
    #   digest-equal (tested across switches in both directions), so the
    #   shipped default is never slower than either pure engine at any
    #   tier: sf0.1 gets the stored engine's round latency, the 10^10
    #   design point gets O(batch) IO.
    frontier_delta: bool | str = "auto"
    # frontier row count at/above which an 'auto' round uses the delta
    # engine. Measured crossover is far above any local tier (stored wins
    # at sf0.1 AND at the 1M-host/10.5M-URL bench tier — BENCH/BASELINE.md
    # round 3: 69.3k vs 57.7-65.7k URLs/s); 10^7 keeps every testable tier
    # on the stored engine while the delta engine engages well before a
    # full-frontier rewrite per round could dominate (10^8-10^10 rows).
    frontier_delta_min_rows: int = 10_000_000
    # delta-round base-fold cadence; 0/None = never fold (unbounded delta
    # chain — expressible, but reads then union one dir per round)
    compact_frontier_every: int | None = 8
    # run the (independent) lineage + metrics writes on background threads,
    # overlapped with the frontier advance; both are joined BEFORE the round
    # commits, so exact resume is unaffected. Pure per-round latency win.
    # Broadcast-mode bloom maintenance (partial collect + registry absorb +
    # snapshot write + rebroadcast) rides the same pool: it only feeds NEXT
    # round's probes and touches no manifest state, so overlapping it with
    # the frontier advance is safe (relational mode stays serial — its
    # compaction writes manifest entries, which must not race commit).
    async_lineage_metrics: bool = True
    # with_seq engine choice (rank.with_seq): the scalable path costs two
    # extra jobs per round (range-partition sampling — which re-executes the
    # whole scheduling window chain — plus the per-partition sizes collect).
    # The selected batch is bounded a priori by n_hosts × B (per-host budget
    # B_h ≤ B), so when that bound fits one window task the single-partition
    # row_number path is strictly cheaper and output-identical (tested in
    # tests/test_rank.py). Bound unknown (no host table) ⇒ scalable. At the
    # 10^10 design point n_hosts alone exceeds this, so the scalable path
    # engages without a config change.
    seq_window_max_rows: int = 1 << 20
    # frontier-advance anti-join strategy: the deferral/exception anti-joins
    # key the whole eligible frontier against ONLY the selected batch's
    # url_hashes. n_selected is known exactly (Observation) before the
    # advance runs, so below this row count the selected-hash side is
    # broadcast — the frontier rewrite becomes exchange-free (guide-§8
    # "decide with small rows, move big rows once"); above it the planner's
    # shuffle join stands. ~16-32 B/key in the built relation ⇒ ≤ ~32 MB.
    selected_broadcast_max_rows: int = 1_000_000
    # fetch-stage task sizing: partitions = clamp(ceil(n_selected / this),
    # 1, defaultParallelism). Big rounds keep full parallelism (unchanged
    # behavior); tiny rounds stop paying one Python-worker round-trip and
    # one parquet file per idle core. The fetch simulator is CPU-trivial, so
    # per-task fixed cost dominates below a few hundred rows; a production
    # HTTP client does its concurrency inside the task (async, per-host
    # connection reuse) so rows-per-task stays the right lever there too.
    fetch_rows_per_task: int = 256
    # Fold seen deltas into one bucket-clustered snapshot every N rounds
    # (run_crawl cadence; 0/None = never). DEFAULT ON, matching
    # compact_frontier_every: read_seen unions one seen_delta dir per round
    # since the last compaction, so an uncompacted crawl of thousands of
    # rounds degrades into an unbounded file-listing + union fan-in — the
    # exact failure the compaction machinery exists to prevent.
    compact_seen_every: int | None = 8

    def with_(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)

    def validate(self) -> None:
        """Shared config validation — called by BOTH init_crawl and resume so
        no entry point can silently run an invalid combination (a resume with
        flags the init would have rejected must fail the same way)."""
        if self.n_buckets <= 0:
            raise ValueError("n_buckets must be positive")
        if not (0 < self.bloom_fpp < 1):
            raise ValueError("bloom_fpp must be in (0, 1)")
        if self.max_fetches_per_host_per_round < 1:
            raise ValueError("max_fetches_per_host_per_round must be >= 1")
        if self.bloom_mode not in ("auto", "broadcast", "relational"):
            raise ValueError(
                "bloom_mode must be 'auto', 'broadcast' or 'relational'"
            )
        if self.frontier_delta not in (True, False, "auto"):
            raise ValueError("frontier_delta must be True, False or 'auto'")
        if self.recrawl_delta not in (True, False, "auto"):
            raise ValueError("recrawl_delta must be True, False or 'auto'")
        if self.compact_recrawl_every is not None and self.compact_recrawl_every < 0:
            raise ValueError(
                "compact_recrawl_every must be >= 0 (0/None = never compact)"
            )
        if self.compact_frontier_every is not None and self.compact_frontier_every < 0:
            raise ValueError(
                "compact_frontier_every must be >= 0 (0/None = never compact)"
            )
        if self.frontier_delta_min_rows < 0:
            raise ValueError("frontier_delta_min_rows must be >= 0")
        if self.recrawl_every is not None and self.recrawl_every < 1:
            raise ValueError("recrawl_every must be >= 1 (None = off)")
        if self.recrawl_interval < 1:
            raise ValueError("recrawl_interval must be >= 1")
        if self.conditional_fetch and self.recrawl_every is None:
            raise ValueError(
                "conditional_fetch requires recrawl_every (validators come "
                "from the recrawl_state fingerprint table)"
            )
        if self.ip_politeness_groups is not None and self.ip_politeness_groups < 1:
            raise ValueError("ip_politeness_groups must be >= 1 (None = off)")
        if self.ip_budget < 1:
            raise ValueError("ip_budget must be >= 1")
        if self.host_boosts is not None:
            for pair in self.host_boosts:
                if (
                    len(pair) != 2
                    or not isinstance(pair[0], str)
                    or not isinstance(pair[1], int)
                ):
                    raise ValueError(
                        "host_boosts must be ((host: str, boost: int), ...)"
                    )


DEFAULT = CrawlConfig()


def test_tier() -> CrawlConfig:
    """FIXTURES.md §4 politeness config for the correctness tier."""
    return CrawlConfig()
