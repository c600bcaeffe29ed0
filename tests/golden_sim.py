"""Sequential golden-model crawler (pure Python, no Spark).

Implements the reference's crawl semantics directly — seed scan, per-host
budgeted admission in (priority, discovery_time, url) order, dedup by
canonical URL, 3-attempt retry with exponential epoch backoff, robots
disallow at entry (reference: spiders/lists.py:17-55, settings.py:68,119,
pipelines.py:32-34,88-122) — over the same deterministic synthetic world
(datagen pure functions). The engine must produce the identical URL-seen
membership and identical per-host fetch ordering (BASELINE.json:6).
"""

from __future__ import annotations

from collections import defaultdict

from whakoom_webscrapper_spark import datagen

MAX_ATTEMPTS = 3


def robots_of(n_hosts: int, budget_scale: int = 1) -> dict[str, tuple[int, list[str]]]:
    """Derived from the same datagen pure functions that gen_robots uses —
    the sim and the Spark world cannot drift (incl. the budget_scale knob)."""
    return {
        f"host{hid}.test": (
            datagen.budget_of(hid, budget_scale),
            datagen.disallow_of(hid),
        )
        for hid in range(n_hosts)
    }


def _host_of_url(url: str) -> str:
    return url.split("://")[1].split("/")[0]


def _path_of_url(url: str) -> str:
    rest = url.split("://")[1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


def _disallowed(url: str, robots: dict) -> bool:
    host = _host_of_url(url)
    if host not in robots:
        return False
    return any(_path_of_url(url).startswith(p) for p in robots[host][1])


def simulate(
    n_urls: int,
    n_hosts: int,
    fanout: int,
    seed_urls: list[str],
    max_epochs: int = 50,
    default_budget: int = 8,
    budget_scale: int = 1,
    token_carryover: bool = True,
    burst_factor: int = 2,
):
    """Returns (seen: dict url->status, fetch_log: list of
    (epoch, host, host_rank, url)). Token bucket semantics mirror the
    engine (U6): available = min(carry + budget, burst*budget); unspent
    tokens carry over; admitted attempts (incl. failures) spend tokens."""
    robots = robots_of(n_hosts, budget_scale)
    # frontier: url -> [priority, discovery_time, attempt, eligible_epoch]
    frontier: dict[str, list] = {}
    seen: dict[str, str] = {}
    fetch_log: list[tuple[int, str, int, str]] = []

    def page_id(url: str) -> int:
        return int(url.rsplit("/", 1)[1])

    def enter(url: str, discovery_time: int, eligible: int):
        if url in seen:
            return
        if _disallowed(url, robots):
            seen[url] = "disallowed"
            return
        if url in frontier:
            return  # keep earliest entry (engine dedup keeps min discovery_time)
        pid = page_id(url)
        frontier[url] = [(pid * 40503) % 10, discovery_time, 0, eligible]

    for u in seed_urls:
        enter(u, 0, 0)

    carry: dict[str, int] = {h: 0 for h in robots}
    for epoch in range(max_epochs):
        if not frontier:
            break
        # token accrual happens every politeness interval the crawl is
        # live, even if nothing is eligible this epoch (engine parity:
        # run_epoch always writes hosttokens while the frontier is
        # nonempty)
        if token_carryover:
            avail = {
                h: min(carry[h] + robots[h][0], burst_factor * robots[h][0])
                for h in robots
            }
        else:
            avail = {h: robots[h][0] for h in robots}
        spent: dict[str, int] = defaultdict(int)
        eligible = [
            (v[0], v[1], url) for url, v in frontier.items() if v[3] <= epoch
        ]
        by_host: dict[str, list] = defaultdict(list)
        for prio, dt, url in eligible:
            by_host[_host_of_url(url)].append((prio, dt, url))
        for host, items in by_host.items():
            items.sort()
            budget = avail.get(host, default_budget)
            spent[host] = min(len(items), budget)
            for rank, (prio, dt, url) in enumerate(items[:budget], start=1):
                pid = page_id(url)
                ent = frontier[url]
                if ent[2] < datagen.fail_attempts_of(pid):  # this attempt fails
                    ent[2] += 1
                    if ent[2] >= MAX_ATTEMPTS:
                        del frontier[url]
                        seen[url] = "failed"
                    else:
                        ent[3] = epoch + 2 ** (ent[2] - 1)
                else:
                    del frontier[url]
                    seen[url] = "fetched"
                    fetch_log.append((epoch, host, rank, url))
                    for dst in datagen.out_link_ids(pid, n_urls, fanout):
                        enter(
                            datagen.url_of(dst, n_hosts),
                            epoch + 1,
                            epoch + 1,
                        )
        if token_carryover:
            carry = {h: avail[h] - spent.get(h, 0) for h in robots}
    return seen, fetch_log
