"""Single-process Python oracle for crawl parity (SURVEY.md §5, north rule).

Implements EXACTLY the wave linearization documented in
`navi_spark.operators.frontier` — same ordering keys, same budget
arithmetic, same skip semantics — with plain dicts/lists/sets. The pytest
suite runs the Spark engine and this oracle on the same synthetic universe
and asserts bit-equal visit order, seen set, per-host counts and budget.

With ``wave_budget=1`` this degenerates to the reference's sequential
min-heap pop order (rank asc, url tiebreak — crawler/WebCrawler.java:63,
Url.java:250-253): :func:`sequential_crawl_oracle` below replays the
reference heap loop verbatim (pop-time domain discard, failure refunds)
and the tests assert the wave algorithm at ``wave_budget=1`` matches it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from navi_spark.functions.urlnorm import host_of_py, normalize_url_py
from navi_spark.operators.robots import is_allowed_py, parse_robots_txt
from navi_spark.sources import datagen


@dataclass
class OracleConfig:
    max_depth: int = 5
    max_pages: int = 6000
    max_pages_per_domain: int = 10
    wave_budget: int = 1000
    max_waves: int = 10_000
    # crawl-delay budget (mirrors CrawlConfig.wave_seconds): a host with
    # crawl-delay d gets max(1, floor(wave_seconds/d)) attempts per wave
    wave_seconds: float | None = None
    # shipped-binary parity (RobotServer.java:228 Pattern.quote bug:
    # no rule ever matches → nothing blocked); mirrors CrawlConfig
    robots_reference_bug: bool = False


@dataclass
class OracleResult:
    visit_order: list[tuple[int, str]] = field(default_factory=list)  # (wave, url)
    seen: set[str] = field(default_factory=set)
    pages: list[dict] = field(default_factory=list)
    host_counts: dict[str, int] = field(default_factory=dict)
    budget_consumed: int = 0
    waves: int = 0


def crawl_oracle(
    seeds: list[str],
    web: dict[str, tuple[str, list[str]]],       # url -> (image_id, raw children)
    images: dict[str, tuple[int, str]],          # image_id -> (phash, caption)
    robots: dict[str, list[tuple[str, str]]],    # host -> parsed '*' rules
    cfg: OracleConfig,
    delays: dict[str, float] | None = None,      # host -> crawl_delay_s
) -> OracleResult:
    res = OracleResult()
    # frontier rows: (url, rank, depth); duplicates allowed
    frontier: list[tuple[str, float, int]] = []
    for s in seeds:
        u = normalize_url_py(s)
        if u is not None:
            frontier.append((u, 1.0, 0))

    phash_seen: set[int] = set()

    for wave in range(1, cfg.max_waves + 1):
        remaining_global = cfg.max_pages - res.budget_consumed
        if not frontier or remaining_global <= 0:
            break
        res.waves = wave

        # 1. within-frontier dedup: min (rank, depth) per url
        best: dict[str, tuple[float, int]] = {}
        for url, rank, depth in frontier:
            cur = best.get(url)
            if cur is None or (rank, depth) < cur:
                best[url] = (rank, depth)
        cand = [(u, r, d) for u, (r, d) in best.items()]

        # 2. depth split FIRST: deep rows bypass the seen check entirely
        #    (the reference's depth check precedes the visited refund, so a
        #    deep pop consumes budget even when already seen), then the
        #    seen check (pop-time visited refund, done eagerly) on shallow
        deep = [(u, r, d) for u, r, d in cand if d > cfg.max_depth]
        new = [(u, r, d) for u, r, d in cand
               if d <= cfg.max_depth and u not in res.seen]

        # 3. pop-time domain split: shallow rows of an AT-CAP host are
        #    discarded; an OPEN host's first `remaining` rows by (rank,
        #    url) are claimable, the rest RE-QUEUE
        by_host: dict[str, list[tuple[str, float, int]]] = {}
        for u, r, d in new:
            by_host.setdefault(host_of_py(u), []).append((u, r, d))
        sel: list[tuple[str, float, int]] = []
        open_rows: list[tuple[str, float, int]] = []
        for host, rows in by_host.items():
            remaining = cfg.max_pages_per_domain - res.host_counts.get(host, 0)
            if remaining <= 0:
                continue  # pop-time discard, no budget
            if cfg.wave_seconds is not None and delays:
                d = delays.get(host, 0.0)
                if d > 0:
                    remaining = min(remaining,
                                    max(1, int(cfg.wave_seconds // d)))
            rows.sort(key=lambda t: (t[1], t[0]))
            open_rows.extend(rows)
            sel.extend(rows[:remaining])

        # 4. global budget: sel ∪ deep in (rank, url) order, first k attempt;
        #    everything poppable-but-unattempted re-queues
        pool = sorted(sel + deep, key=lambda t: (t[1], t[0]))
        k = min(remaining_global, cfg.wave_budget)
        attempts = pool[:k]
        attempted_urls = {u for u, _, _ in attempts}
        leftover = [
            row for row in open_rows + deep if row[0] not in attempted_urls
        ]

        successes: list[tuple[str, float, int]] = []
        expansions: list[tuple[str, float, int]] = []
        for u, r, d in attempts:
            # 5. depth quirk: consumes budget, yields nothing
            if d > cfg.max_depth:
                res.budget_consumed += 1
                continue
            # 6. robots (allow-all in shipped-binary parity mode)
            host = host_of_py(u)
            if not cfg.robots_reference_bug and not is_allowed_py(
                u, robots.get(host, [])
            ):
                continue
            # 7. fetch + validate + language gate
            hit = web.get(u)
            if hit is None:
                continue
            image_id, children_raw = hit
            img = images.get(image_id)
            if img is None:
                continue  # dangling image = fetch failure
            phash, caption = img
            if caption and sum(ord(c) > 127 for c in caption) / len(caption) > 0.1:
                continue  # C14
            # 8. content dedup, order-aware (attempts iterate in (rank,url))
            if phash in phash_seen:
                continue
            # 9. success
            phash_seen.add(phash)
            res.seen.add(u)
            res.host_counts[host] = res.host_counts.get(host, 0) + 1
            res.budget_consumed += 1
            children_norm = []
            if d < cfg.max_depth:
                for c in children_raw:
                    n = normalize_url_py(c)
                    if n is not None:
                        children_norm.append(n)
            res.pages.append(
                {
                    "url": u, "image_id": image_id, "phash": phash,
                    "caption": caption, "depth": d, "rank": r,
                    "host": host, "wave_id": wave, "children": children_norm,
                }
            )
            successes.append((u, r, d))
            for c in children_norm:
                expansions.append((c, 1.0, d + 1))

        # 10. expansion filtering mirrors the engine: not-seen (post-wave)
        #     and host-still-open (post-wave counts)
        expansions = [
            (u, r, d)
            for u, r, d in expansions
            if u not in res.seen
            and res.host_counts.get(host_of_py(u), 0) < cfg.max_pages_per_domain
        ]
        frontier = leftover + expansions

        if res.budget_consumed >= cfg.max_pages:
            break

    # visit order: (wave, rank, url) — all ranks are 1.0 pre-PageRank
    res.visit_order = [(p["wave_id"], p["url"]) for p in res.pages]
    res.visit_order.sort(key=lambda t: (t[0], t[1]))
    return res


def sequential_crawl_oracle(
    seeds: list[str],
    web: dict[str, tuple[str, list[str]]],
    images: dict[str, tuple[int, str]],
    robots: dict[str, list[tuple[str, str]]],
    cfg: OracleConfig,
) -> OracleResult:
    """Verbatim replay of the reference's sequential heap loop
    (crawler/WebCrawler.java crawl() + processUrl()):

      pop lowest (rank, url[, depth]) → consume one budget unit →
      depth trip keeps the unit (:364) → domain-at-cap discard refunds
      (:440) → visited refunds (:446) → robots refunds (:451) → fetch
      refunds (:455) → dup-content refunds (:472) → success stores, counts
      the domain (:523), enqueues unvisited children (:496-518).

    The tests assert the wave engine/oracle at ``wave_budget=1`` is
    bit-equal to this, proving the wave linearization degenerates to the
    reference's pop order — including the failure-refund path where a
    same-host URL queued behind a failing one still gets crawled.
    """
    import heapq

    res = OracleResult()
    heap: list[tuple[float, str, int]] = []
    for s in seeds:
        u = normalize_url_py(s)
        if u is not None:
            heapq.heappush(heap, (1.0, u, 0))
    phash_seen: set[int] = set()

    while heap and res.budget_consumed < cfg.max_pages:
        r, u, d = heapq.heappop(heap)
        res.budget_consumed += 1  # crawledPages.getAndIncrement()
        if d > cfg.max_depth:
            continue  # consumes budget, stores nothing (:364-367)
        host = host_of_py(u)
        if res.host_counts.get(host, 0) >= cfg.max_pages_per_domain:
            res.budget_consumed -= 1  # :440-444 refund
            continue
        if u in res.seen:
            res.budget_consumed -= 1  # :446-450 refund
            continue
        if not cfg.robots_reference_bug and not is_allowed_py(
            u, robots.get(host, [])
        ):
            res.budget_consumed -= 1  # :451-454 refund
            continue
        hit = web.get(u)
        if hit is None:
            res.budget_consumed -= 1  # :455-461 refund
            continue
        image_id, children_raw = hit
        img = images.get(image_id)
        if img is None:
            res.budget_consumed -= 1
            continue
        phash, caption = img
        if caption and sum(ord(c) > 127 for c in caption) / len(caption) > 0.1:
            res.budget_consumed -= 1  # C14
            continue
        if phash in phash_seen:
            res.budget_consumed -= 1  # :472-478 refund
            continue
        phash_seen.add(phash)
        res.seen.add(u)
        res.host_counts[host] = res.host_counts.get(host, 0) + 1
        children_norm = []
        if d < cfg.max_depth:
            for c in children_raw:
                n = normalize_url_py(c)
                if n is not None:
                    children_norm.append(n)
                    if n not in res.seen:
                        heapq.heappush(heap, (1.0, n, d + 1))
        res.pages.append(
            {
                "url": u, "image_id": image_id, "phash": phash,
                "caption": caption, "depth": d, "rank": r, "host": host,
                "wave_id": len(res.pages) + 1, "children": children_norm,
            }
        )

    res.visit_order = [(p["wave_id"], p["url"]) for p in res.pages]
    return res


def oracle_delays(n_hosts: int) -> dict[str, float]:
    """host -> crawl_delay_s from the same deterministic generator the
    Spark robots table uses (hosts with delay 0 omitted)."""
    out = {}
    for h in range(n_hosts):
        d = datagen.crawl_delay_for(h)
        if d > 0:
            out[datagen.canonical_host(h)] = d
    return out


def build_oracle_inputs(
    n_urls: int, n_hosts: int, n_images: int | None = None, version: int = 0
) -> tuple[dict, dict, dict]:
    """(web, images, robots) dicts from the same deterministic generators the
    Spark tables come from — NO Spark required. `version` selects the
    drifted web snapshot a recrawl sees (datagen.web_image_id/web_children)."""
    n_images = n_images if n_images is not None else n_urls
    web = {}
    for i in range(n_urls):
        web[datagen.canonical_url(i, n_hosts)] = (
            datagen.web_image_id(i, n_images, version),
            datagen.web_children(i, n_urls, n_hosts, version),
        )
    images = {}
    for i in range(n_images):
        phash, caption = datagen.image_phash_caption(i)
        images[f"img{i:010d}"] = (phash, caption)
    robots = {}
    for h in range(n_hosts):
        txt = datagen.robots_txt_for(h)
        if txt is not None:
            robots[datagen.canonical_host(h)] = parse_robots_txt(txt)
    return web, images, robots


def sequential_recrawl_oracle(
    pages: list[dict],
    web: dict[str, tuple[str, list[str]]],
    images: dict[str, tuple[int, str]],
    robots: dict[str, list[tuple[str, str]]],
    cfg: OracleConfig,
    max_pages: int | None = None,
) -> dict:
    """Verbatim replay of the reference recrawl loop (WebCrawler.java
    recrawl/recrawlThread/recrawlUrl, :536-761): pages in rank-DESC order,
    budget unit per pop with refunds for over-cap (:663-668), robots
    (:670-674), doc==null — fetch fail or 304 (:680-699); 200 with equal
    hash keeps old fields but CONSUMES (:705-718); changed updates fields
    and flags link structure (:719-747). PageRank recomputed iff any
    consumed page changed links (:571-580, flush-clearing quirk replaced
    by the intent — see CrawlEngine.recrawl)."""
    budget = max_pages if max_pages is not None else cfg.max_pages
    order = sorted(pages, key=lambda p: (-p["rank"], p["url"]))
    updated = {p["url"]: dict(p) for p in pages}
    statuses: dict[str, str] = {}
    host_counts: dict[str, int] = {}
    consumed = 0
    any_struct = False
    for p in order:
        if consumed >= budget:
            break  # :590-594 — pop stops once the budget is gone
        u = p["url"]
        host = host_of_py(u)
        if host_counts.get(host, 0) >= cfg.max_pages_per_domain:
            statuses[u] = "domain_skip"
            continue
        if not cfg.robots_reference_bug and not is_allowed_py(
            u, robots.get(host, [])
        ):
            statuses[u] = "blocked_robots"
            continue
        hit = web.get(u)
        img = images.get(hit[0]) if hit else None
        if img is None:
            statuses[u] = "touched"  # doc == null: keep old, refund
            continue
        new_phash, new_caption = img
        same_payload = (
            new_phash == p["phash"] and new_caption == p["caption"]
        )
        if datagen.host_supports_validators(host) and same_payload:
            statuses[u] = "touched"  # 304
            continue
        if new_phash == p["phash"]:
            statuses[u] = "unchanged"  # 200, equal hash: keep old, consume
            host_counts[host] = host_counts.get(host, 0) + 1
            consumed += 1
            continue
        # changed: update fields, recompute children if depth allows
        statuses[u] = "changed"
        host_counts[host] = host_counts.get(host, 0) + 1
        consumed += 1
        new_children: list[str] = []
        if p["depth"] < cfg.max_depth:
            for c in hit[1]:
                n = normalize_url_py(c)
                if n is not None:
                    new_children.append(n)
        struct = new_children != p["children"]
        any_struct = any_struct or struct
        row = updated[u]
        row["image_id"] = hit[0]
        row["phash"] = new_phash
        row["caption"] = new_caption
        row["children"] = new_children
    ranks: dict[str, float] | None = None
    if any_struct:
        from navi_spark.operators.pagerank import pagerank_py

        ranks = pagerank_py(list(updated.values()))
        for u, r in ranks.items():
            updated[u]["rank"] = r
    return {
        "pages": updated,
        "statuses": statuses,
        "consumed": consumed,
        "host_counts": host_counts,
        "pagerank_recomputed": any_struct,
        "ranks": ranks,
    }
