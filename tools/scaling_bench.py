"""Two-cluster-size scaling bench (sandbox protocol from BASELINE.md).

No real cluster exists here, so the north rule's N vs 4N executor
criterion is evidenced by running the SAME crawl job on the SAME world at
local[8] and local[32] (task directive). Each run is a separate process
(own JVM) started fresh; the world is generated once and shared.

    python tools/scaling_bench.py --n-urls 400000 --hosts 8000 \
        --budget-scale 4 --max-epochs 4 --out /tmp/scalebench

Writes BENCH/scaling.json and prints the efficiency:
    eff = (urls/sec at local[32]) / (4 x urls/sec at local[8])
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_crawl(args, master: str, state_suffix: str) -> dict:
    state = os.path.join(args.out, f"run_{state_suffix}")
    shutil.rmtree(os.path.join(state), ignore_errors=True)
    # point --out at a dir whose world/ symlinks the shared world
    os.makedirs(state, exist_ok=True)
    world_link = os.path.join(state, "world")
    if not os.path.exists(world_link):
        os.symlink(os.path.join(args.out, "world"), world_link)
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "crawl.py"),
        "--n-urls", str(args.n_urls), "--hosts", str(args.hosts),
        "--fanout", str(args.fanout), "--seeds", str(args.seeds),
        "--budget-scale", str(args.budget_scale),
        "--out", state, "--max-epochs", str(args.max_epochs),
        "--master", master, "--partitions", str(args.partitions),
        "--lean",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    last = [line for line in out.stdout.strip().splitlines() if line.startswith("{")]
    if not last:
        raise RuntimeError(f"no JSON from crawl at {master}:\n{out.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=400_000)
    ap.add_argument("--hosts", type=int, default=8000)
    ap.add_argument("--fanout", type=int, default=12)
    ap.add_argument("--seeds", type=int, default=8000)
    ap.add_argument("--budget-scale", type=int, default=4)
    ap.add_argument("--max-epochs", type=int, default=4)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--out", default="/tmp/scalebench")
    ap.add_argument("--masters", nargs=2, default=["local[8]", "local[32]"])
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    world = os.path.join(args.out, "world")
    if not os.path.exists(os.path.join(world, "linkgraph")):
        # generate once at full parallelism via a throwaway crawl dir
        gen = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "jobs", "crawl.py"),
                "--n-urls", str(args.n_urls), "--hosts", str(args.hosts),
                "--fanout", str(args.fanout), "--seeds", str(args.seeds),
                "--budget-scale", str(args.budget_scale),
                "--out", args.out, "--max-epochs", "0",
                "--master", "local[32]", "--partitions", str(args.partitions),
            ],
            capture_output=True, text=True, timeout=7200,
        )
        if not os.path.exists(os.path.join(world, "linkgraph")):
            raise RuntimeError(f"world gen failed:\n{gen.stderr[-2000:]}")

    small_master, big_master = args.masters
    r_small = run_crawl(args, small_master, small_master.replace("[", "_").replace("]", ""))
    r_big = run_crawl(args, big_master, big_master.replace("[", "_").replace("]", ""))

    eff = (r_big["urls_per_sec"] / r_small["urls_per_sec"]) / 4.0
    result = {
        "protocol": "same job, same world, fresh state, separate JVMs",
        "world": {
            "n_urls": args.n_urls, "hosts": args.hosts, "fanout": args.fanout,
            "seeds": args.seeds, "budget_scale": args.budget_scale,
            "max_epochs": args.max_epochs,
        },
        small_master: r_small,
        big_master: r_big,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
