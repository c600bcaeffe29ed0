"""A/B the JPEG decoder's effect on the WIDE crawl leg (local[16]).

Round-4 context: the fused-LUT / one-GEMM decoder (commit 1c5995a) made
every local[4] leg faster but every local[16] leg slower across 8
post-change scaling repetitions, while the in-rep bare-multiprocessing
controls stayed healthy — the signature of an engine-side scaling
regression, not host drift. The one-GEMM IDCT does 4x the MACs of the
separable form: spare compute absorbs that at 4 workers, a saturated
box does not at 16. This driver settles it empirically: interleaved
local[16] crawl legs on the SAME world with jpeg.py swapped between
HEAD ("new") and the headline-campaign version ("old", 772b070),
balanced order (new,old,old,new,new,old), fresh state + warmed page
cache per leg, artifact flushed after every leg.

Usage: python tools/decoder_ab.py --out /tmp/scale_r04b \
           --json BENCH/decoder_ab.json
(world must already exist under <out>/world; reuses the scaling
campaign's world so numbers are comparable leg-for-leg.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JPEG = os.path.join(REPO, "whakoom_webscrapper_spark", "jpeg.py")


def run_leg(args, master: str, tag: str) -> dict:
    state = os.path.join(args.out, f"ab_{tag}")
    shutil.rmtree(state, ignore_errors=True)
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
    subprocess.run(
        f"cat {os.path.join(args.out, 'world')}/*/*.parquet > /dev/null",
        shell=True, timeout=1200,
    )
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="12g")
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=7200, env=env)
    last = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")]
    if not last:
        raise RuntimeError(f"no JSON from crawl:\n{out.stderr[-2000:]}")
    res = json.loads(last[-1])
    shutil.rmtree(state, ignore_errors=True)
    return res


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
    ap.add_argument("--out", default="/tmp/scale_r04b")
    ap.add_argument("--json",
                    default=os.path.join(REPO, "BENCH", "decoder_ab.json"))
    ap.add_argument("--old-ref", default="772b070")
    args = ap.parse_args()

    head = open(JPEG).read()
    old = subprocess.run(
        ["git", "-C", REPO, "show", f"{args.old_ref}:"
         "whakoom_webscrapper_spark/jpeg.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    variants = {"new": head, "old": old}

    result = {
        "question": "did the fused-LUT/one-GEMM decoder (1c5995a) regress "
                    "the wide (local[16]) crawl leg?",
        "protocol": "interleaved local[16] legs, same world, fresh state, "
                    "warmed page cache, jpeg.py swapped per leg, balanced "
                    "order; artifact flushed per leg",
        "master": args.master,
        "old_ref": args.old_ref,
        "order": ["new", "old", "old", "new", "new", "old"],
        "legs": [],
    }

    def flush() -> None:
        for v in ("new", "old"):
            walls = [leg["wall_s"] for leg in result["legs"]
                     if leg["variant"] == v]
            if walls:
                result[f"median_wall_{v}"] = round(statistics.median(walls), 1)
        if "median_wall_new" in result and "median_wall_old" in result:
            result["new_over_old_wall_ratio"] = round(
                result["median_wall_new"] / result["median_wall_old"], 3)
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)

    try:
        for i, variant in enumerate(result["order"]):
            with open(JPEG, "w") as f:
                f.write(variants[variant])
            t0 = time.time()
            res = run_leg(args, args.master, f"{variant}_{i}")
            leg = {
                "i": i, "variant": variant,
                "wall_s": res["wall_s"],
                "urls_per_sec": res["urls_per_sec"],
                "fetched": res["fetched"],
                "epoch_durations_s": [
                    e["duration_s"] for e in res.get("epoch_stats", [])
                ],
            }
            result["legs"].append(leg)
            flush()
            print(f"leg {i} [{variant}]: wall={res['wall_s']}s "
                  f"({res['urls_per_sec']} urls/s) "
                  f"epochs={leg['epoch_durations_s']} "
                  f"(leg took {time.time() - t0:.0f}s)", flush=True)
    finally:
        with open(JPEG, "w") as f:
            f.write(head)  # always restore HEAD
    fetched = {leg["fetched"] for leg in result["legs"]}
    result["identical_rows"] = len(fetched) == 1
    flush()
    print(json.dumps({k: v for k, v in result.items() if k != "legs"},
                     indent=1))


if __name__ == "__main__":
    main()
