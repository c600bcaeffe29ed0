"""A/B bench: broadcast fetch join vs bucketed SortMergeJoin fallback.

The crawl's fetch is a lookup of the admitted (politeness-bounded) URL
set into the linkgraph/images tables. The default plan broadcasts the
admitted side and streams the big tables; past `broadcast_fetch_max`
(10^7+ admitted at the design point) the engine switches to bucketed
catalog tables so the SortMergeJoin exchanges ONLY the admitted side
(sources/bucketed.py). This driver measures both paths on the same
world at the same parallelism, interleaved A/B/A/B so host drift hits
both sides, and reports per-run throughput + medians.

    python tools/fetch_join_ab.py --out /tmp/sb4 --master local[16] --reps 2

Writes BENCH/fetch_join_ab.json. The bucketed-table ingest (a once-per-
corpus cost, like any bucketing strategy) happens before the crawl
timer starts in jobs/crawl.py and is reported separately as ingest_s.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, mode: str, tag: str) -> dict:
    state = os.path.join(args.out, f"ab_{tag}")
    subprocess.run(["rm", "-rf", state])
    os.makedirs(state, exist_ok=True)
    world_link = os.path.join(state, "world")
    if not os.path.exists(world_link):
        os.symlink(os.path.join(args.out, "world"), world_link)
    subprocess.run(
        f"cat {os.path.join(args.out, 'world')}/*/*.parquet > /dev/null",
        shell=True, timeout=1200,
    )
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "crawl.py"),
        "--n-urls", str(args.n_urls), "--hosts", str(args.hosts),
        "--fanout", str(args.fanout), "--seeds", str(args.seeds),
        "--budget-scale", str(args.budget_scale),
        "--out", state, "--max-epochs", str(args.max_epochs),
        "--master", args.master, "--partitions", str(args.partitions),
        "--lean", "--fetch-join", mode,
    ]
    t0 = time.perf_counter()
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=7200,
        env=dict(os.environ, SPARK_GRAFT_DRIVER_MEM="12g"),
    )
    total = time.perf_counter() - t0
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no JSON from {mode}:\n{out.stderr[-2000:]}")
    r = json.loads(lines[-1])
    # ingest_s = process wall minus crawl wall minus JVM/session startup
    # (measured for both modes; for broadcast it is ~0 + startup noise)
    r["proc_wall_s"] = round(total, 2)
    r["mode"] = mode
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=300_000)
    ap.add_argument("--hosts", type=int, default=8000)
    ap.add_argument("--fanout", type=int, default=12)
    ap.add_argument("--seeds", type=int, default=40_000)
    ap.add_argument("--budget-scale", type=int, default=4)
    ap.add_argument("--max-epochs", type=int, default=2)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--out", default="/tmp/sb4")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--json", default=os.path.join(REPO, "BENCH", "fetch_join_ab.json"))
    args = ap.parse_args()

    result = {
        "protocol": "same world, same master, fresh state per run, "
                    "interleaved broadcast/bucketed x reps; median per mode",
        "master": args.master,
        "world": {"n_urls": args.n_urls, "hosts": args.hosts,
                  "fanout": args.fanout, "seeds": args.seeds,
                  "budget_scale": args.budget_scale,
                  "max_epochs": args.max_epochs},
        "runs": [],
        "status": "in-progress",
    }

    def flush() -> None:
        by = {}
        for r in result["runs"]:
            by.setdefault(r["mode"], []).append(r["urls_per_sec"])
        for mode, vals in by.items():
            result[f"{mode}_urls_per_sec_median"] = statistics.median(vals)
        tmp = args.json + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=2)
        os.replace(tmp, args.json)

    flush()
    for rep in range(args.reps):
        for mode in ("broadcast", "bucketed"):
            r = run(args, mode, f"{mode}_{rep}")
            r["rep"] = rep
            result["runs"].append(r)
            flush()
            print(f"rep {rep} {mode}: {r['urls_per_sec']} urls/s "
                  f"(crawl {r['wall_s']}s, proc {r['proc_wall_s']}s)",
                  file=sys.stderr)
    fetched = {r["fetched"] for r in result["runs"]}
    assert len(fetched) == 1, f"nondeterminism across modes: {fetched}"
    result["status"] = "complete"
    flush()
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
