"""Per-host politeness: robots rules + token-bucket admission.

Reference semantics: ``ROBOTSTXT_OBEY = True`` (settings.py:68) filters
requests per host's rules; AutoThrottle (settings.py:119-126) caps the
per-host request rate. The engine's epoch model makes both set-oriented:

- robots rules live in a small DataFrame, broadcast-joined onto the
  frontier; a disallowed URL never enters the frontier (same place in the
  lifecycle as Scrapy's robots middleware — before scheduling).
- the token bucket becomes *rank ≤ available(host) per epoch*: an epoch
  represents one politeness interval; a host ACCRUES ``epoch_budget``
  tokens per interval into a bucket capped at ``burst × epoch_budget``
  (the classic token bucket's Δt accrual + burst capacity — AutoThrottle
  analog). Unspent tokens carry over (``accrue_tokens``), persisted per
  epoch in the crawl state so resume is exact. Admission order is the
  north rule's ``(priority, discovery_time, url)`` — implemented as
  ``row_number()`` over a host-partitioned window, which Spark executes
  as one shuffle by host with in-partition sort: pure built-ins,
  whole-stage codegen, no Python.

Skew note (BASELINE.json:14): the window shuffle keys by ``host``; a hot
host concentrates its rows in one partition, but only until the rank
filter — and the filter needs only the top ``budget`` rows per host.
Budgets are small (tokens per interval), so we pre-prune with a salted
two-phase top-K: rank within (host, salt) first, keep rank ≤ budget,
then the exact per-host rank. The hot partition never holds more than
``budget × n_salts`` rows after phase 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 8
BURST_FACTOR = 2  # bucket capacity = BURST_FACTOR x epoch_budget


def accrue_tokens(
    robots: DataFrame,
    carry: DataFrame | None,
    burst: int = BURST_FACTOR,
) -> DataFrame:
    """Token-bucket accrual for one politeness interval:
    ``available = min(carry + epoch_budget, burst*epoch_budget)`` per
    robots host. ``carry`` is the previous epoch's unspent tokens
    (host, carry) or None at epoch 0 (bucket starts at one interval's
    budget). Small (one row per host) — rides the same broadcast as the
    robots rules."""
    b = robots.select("host", "epoch_budget")
    if carry is None:
        return b.withColumn("available", F.col("epoch_budget"))
    return (
        b.join(carry.select("host", "carry"), "host", "left")
        .withColumn(
            "available",
            F.least(
                F.coalesce(F.col("carry"), F.lit(0)) + F.col("epoch_budget"),
                F.lit(burst) * F.col("epoch_budget"),
            ).cast("int"),
        )
        .select("host", "epoch_budget", "available")
    )


def apply_robots(frontier: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split (allowed, disallowed) by broadcast robots rules.

    Returns frontier columns unchanged; ``disallowed`` rows carry a
    ``status='disallowed'`` so they can be resolved into the seen set.
    """
    r = F.broadcast(robots.select("host", "disallow_prefixes"))
    joined = frontier.join(r, "host", "left")
    path = F.regexp_extract(F.col("url"), r"^[a-z]+://[^/]+(/.*)?$", 1)
    blocked = F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists(
            F.col("disallow_prefixes"),
            lambda p: path.startswith(p),
        ),
    ).otherwise(F.lit(False))
    flagged = joined.withColumn("_blocked", blocked).drop("disallow_prefixes")
    return (
        flagged.filter(~F.col("_blocked")).drop("_blocked"),
        flagged.filter(F.col("_blocked")).drop("_blocked"),
    )


def admit_per_host(
    candidates: DataFrame,
    robots: DataFrame,
    n_salts: int = 8,
    default_budget: int = DEFAULT_BUDGET,
    tokens: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Token-bucket admission: top-``available`` rows per host in
    (priority, discovery_time, url) order. Returns (admitted, deferred);
    ``admitted`` gains a ``host_rank`` column (1-based, the deterministic
    per-host crawl order the correctness gate compares).

    ``tokens`` is the accrued bucket (host, available) from
    ``accrue_tokens``; without it the budget is the per-epoch constant
    (no carry-over — the pre-U6 behavior, kept for ad-hoc admission).

    Two-phase to bound skew: phase 1 ranks within (host, salt) and keeps
    at most ``budget`` per salt bucket, so the exact phase-2 per-host sort
    sees ≤ budget × n_salts rows for even the hottest host.
    """
    budgets = (
        tokens.select("host", F.col("available").alias("epoch_budget"))
        if tokens is not None
        else robots.select("host", "epoch_budget")
    )
    cand = candidates.join(F.broadcast(budgets), "host", "left").withColumn(
        "_budget", F.coalesce(F.col("epoch_budget"), F.lit(default_budget))
    ).drop("epoch_budget")

    order = [F.asc("priority"), F.asc("discovery_time"), F.asc("url")]
    salt = F.pmod(F.xxhash64("url"), F.lit(n_salts))
    w1 = Window.partitionBy("host", salt.alias("_salt")).orderBy(*order)
    pruned = (
        cand.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("_budget"))
        .drop("_r1")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = pruned.withColumn("host_rank", F.row_number().over(w2))
    admitted = ranked.filter(F.col("host_rank") <= F.col("_budget")).drop("_budget")
    return admitted, deferred_of(candidates, admitted)


def deferred_of(candidates: DataFrame, admitted: DataFrame) -> DataFrame:
    """Eligible-but-unadmitted complement. Anti-join against the RAW
    candidate input (not the budget-joined lineage) so the robots
    broadcast + window chain is never recomputed on the deferred side —
    pass the PERSISTED admitted for a cache-hit key side."""
    return candidates.join(admitted.select("url_hash"), "url_hash", "left_anti")


def apply_blocklist(
    frontier: DataFrame, blocklist: DataFrame, host_col: str = "host"
) -> tuple[DataFrame, DataFrame]:
    """Split a frontier into (allowed, blocked) against a domain blocklist
    with dot-suffix semantics (blocking ``bad.com`` blocks ``img.bad.com``).

    The join form for blocklists too large for a plan literal (the literal
    form is ``functions.urls.host_blocked``): explode each host's
    dot-suffixes (≤ label count, ~4 rows per URL), broadcast the blocklist
    (even 10^6 domains ≈ tens of MB) and equi-semi-join — the frontier is
    never shuffled, and the suffix explosion is the narrowest projection
    (id + suffix only). ``blocklist`` must have a ``domain`` column.
    """
    from whakoom_webscrapper_spark.functions import urls as U

    sufs = frontier.select(
        F.col(host_col).alias("_h"),
        F.explode(U.host_suffixes(F.col(host_col))).alias("_suf"),
    )
    blocked_hosts = (
        sufs.join(
            F.broadcast(blocklist.select(F.col("domain").alias("_suf"))),
            "_suf",
            "leftsemi",
        )
        .select(F.col("_h"))
        .distinct()
    )
    blocked = frontier.join(
        F.broadcast(blocked_hosts.withColumnRenamed("_h", host_col)),
        host_col,
        "leftsemi",
    )
    allowed = frontier.join(
        F.broadcast(blocked_hosts.withColumnRenamed("_h", host_col)),
        host_col,
        "leftanti",
    )
    return allowed, blocked
