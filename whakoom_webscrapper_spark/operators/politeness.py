"""Per-host politeness: robots rules + token-bucket admission.

Reference semantics: ``ROBOTSTXT_OBEY = True`` (settings.py:68) filters
requests per host's rules; AutoThrottle (settings.py:119-126) caps the
per-host request rate. The engine's epoch model makes both set-oriented:

- robots rules live in a small DataFrame, broadcast-joined onto the
  frontier; a disallowed URL never enters the frontier (same place in the
  lifecycle as Scrapy's robots middleware — before scheduling).
- the token bucket becomes *rank ≤ budget per host per epoch*: an epoch
  represents one politeness interval, so a host's bucket holds
  ``epoch_budget`` tokens. Admission order is the north rule's
  ``(priority, discovery_time, url)`` — implemented as ``row_number()``
  over a host-partitioned window, which Spark executes as one shuffle by
  host with in-partition sort: pure built-ins, whole-stage codegen, no
  Python. Carry-over is free: unadmitted rows simply stay ``pending``.

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
) -> tuple[DataFrame, DataFrame]:
    """Token-bucket admission: top-``epoch_budget`` rows per host in
    (priority, discovery_time, url) order. Returns (admitted, deferred);
    ``admitted`` gains a ``host_rank`` column (1-based, the deterministic
    per-host crawl order the correctness gate compares).

    Two-phase to bound skew: phase 1 ranks within (host, salt) and keeps
    at most ``budget`` per salt bucket, so the exact phase-2 per-host sort
    sees ≤ budget × n_salts rows for even the hottest host.
    """
    b = F.broadcast(robots.select("host", "epoch_budget"))
    cand = candidates.join(b, "host", "left").withColumn(
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
    deferred_keys = admitted.select("url_hash")
    deferred = cand.drop("_budget").join(deferred_keys, "url_hash", "left_anti")
    return admitted, deferred
