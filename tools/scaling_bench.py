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
        "--lean", "--seen-filter", args.seen_filter,
    ]
    # warm the OS page cache over the world files so both parallelism
    # levels see identical (warm) I/O — otherwise whichever run goes first
    # pays the cold-read penalty and the comparison is biased
    subprocess.run(
        f"cat {os.path.join(args.out, 'world')}/*/*.parquet > /dev/null",
        shell=True, timeout=1200,
    )
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="12g")  # right-sized: an
    # oversized heap makes G1 young-gen rotate through fresh regions —
    # measured 2.07x slower epoch-1 at 48g on this first-touch-fault host
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=7200, env=env)
    last = [line for line in out.stdout.strip().splitlines() if line.startswith("{")]
    if not last:
        raise RuntimeError(f"no JSON from crawl at {master}:\n{out.stderr[-2000:]}")
    return json.loads(last[-1])


def machine_ceiling(n_small: int, n_big: int) -> dict:
    """Control experiments: the best scaling this VM can demonstrate
    between the two process counts, WITHOUT Spark — so the crawl's number
    can be read against what the hardware itself permits.

    Two payloads:
    - ``pure``: cache-resident BLAS (tiny matmuls) — the absolute best
      case; scales until vCPU contention.
    - ``workload``: the crawl's EXACT per-page Python work (decode,
      pHash, PSNR, features, HTML link extraction over a pre-encoded
      corpus) via a bare multiprocessing pool — the representative
      control. ``ceiling_efficiency`` reports the workload payload.

    This up-front ceiling is CONTEXT; the normalization that matters is
    the per-repetition interleaved ``workload_control`` (host regime
    drifts between an up-front control and later crawl runs).
    """
    import multiprocessing as mp
    import statistics
    import time as _t

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    out: dict = {}
    # fixed TOTAL work per payload (same task list at both pool sizes) so
    # the ratio is a true strong-scaling measurement; each worker first
    # runs one untimed warm-up call (imports + arena first-touch faults —
    # this host pays ~300us/page on fresh memory, which once swamped the
    # control and produced impossible >1 "efficiencies").
    # THREE interleaved repetitions per payload with a median-of-ratios
    # headline: this VM's vCPUs stall in multi-second bursts (single-run
    # controls measured anywhere from 0.59 to 1.02 for the SAME payload
    # minutes apart), so a one-shot denominator is meaningless.
    for name, fn, total in (
        ("pure", _pure_compute, 4 * n_big),
        ("workload", _workload_compute, 2 * n_big),
    ):
        effs, small_rates, big_rates = [], [], []
        for _rep in range(3):
            rates = {}
            for procs in (n_small, n_big):
                with mp.get_context("spawn").Pool(
                    procs, initializer=_warmup, initargs=(fn,)
                ) as p:
                    t0 = _t.time()
                    p.map(fn, range(1, total + 1))
                    rates[procs] = total / (_t.time() - t0)
            small_rates.append(round(rates[n_small], 2))
            big_rates.append(round(rates[n_big], 2))
            effs.append(
                round(rates[n_big] / rates[n_small] / (n_big / n_small), 3)
            )
        out[f"{name}_procs_{n_small}"] = small_rates
        out[f"{name}_procs_{n_big}"] = big_rates
        out[f"{name}_efficiencies"] = effs
        out[f"{name}_efficiency"] = round(statistics.median(effs), 3)
    out["ceiling_efficiency"] = out["workload_efficiency"]
    return out


def frequency_probe() -> dict:
    """Per-process throughput of the cache-resident pure payload at pool
    sizes 1..32. On this VM the per-proc rate steps DOWN ~1.5x between 4
    and 8 busy vCPUs and is flat from 8 to 32 — single-box CPU frequency
    boost at low occupancy. Any N-vs-4N pair that straddles the step
    (e.g. 4v16) measures Intel turbo, not the engine; pairs on the flat
    region (8v32) measure the engine. A real cluster's N->4N adds whole
    nodes at unchanged per-core frequency, so the flat-region pair is
    the faithful sandbox analog. This probe pins that argument with data
    in the same artifact."""
    import multiprocessing as mp
    import time as _t

    out = {}
    for procs in (1, 2, 4, 8, 16, 32):
        total = max(4 * procs, 8)
        with mp.get_context("spawn").Pool(
            procs, initializer=_warmup, initargs=(_pure_compute,)
        ) as p:
            t0 = _t.time()
            p.map(_pure_compute, range(1, total + 1))
            rate = total / (_t.time() - t0)
        out[f"procs_{procs}"] = round(rate / procs, 3)  # per-proc rate
    return out


def workload_control(n_small: int, n_big: int, total_mult: int = 8) -> dict:
    """ONE interleaved control measurement (small pool then big pool) of
    the crawl's exact per-page work. Called INSIDE each repetition,
    right after that repetition's two crawl runs, so the control shares
    the crawl's frequency/steal regime — this host's per-core rate
    drifts 20-40% over minutes, so a control measured once up-front
    normalizes against a regime the crawl runs may never have seen."""
    import multiprocessing as mp
    import time as _t

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    total = total_mult * n_big
    rates = {}
    for procs in (n_small, n_big):
        with mp.get_context("spawn").Pool(
            procs, initializer=_warmup, initargs=(_workload_compute,)
        ) as p:
            t0 = _t.time()
            p.map(_workload_compute, range(1, total + 1))
            rates[procs] = total / (_t.time() - t0)
    return {
        f"pages_per_s_procs_{n_small}": round(120 * rates[n_small], 1),
        f"pages_per_s_procs_{n_big}": round(120 * rates[n_big], 1),
        "efficiency": round(
            rates[n_big] / rates[n_small] / (n_big / n_small), 3
        ),
    }


def _warmup(fn) -> None:
    """Untimed per-worker warm-up: imports, LUT builds, malloc-arena
    first-touch. Runs task id 0 (ids passed to the timed map start at 1)."""
    fn(0)


def _pure_compute(seed: int) -> float:
    import numpy as _np

    rng = _np.random.default_rng(seed)
    a = rng.standard_normal((64, 64))
    for _ in range(3000):
        a = _np.tanh(a @ a.T * 0.01)
    return float(a.sum())


_WORK_CORPUS: list | None = None


def _workload_corpus() -> list:
    """Fixed 120-page corpus, encoded ONCE per worker (in the untimed
    warm-up): the timed task then does EXACTLY the crawl's per-page UDF
    work — decode, pHash, PSNR vs reference pixels, 64-d features, HTML
    link extraction — and nothing else. Earlier control versions also
    paid an encode per page, work the crawl never does; a control doing
    different work than the job is not a ceiling for that job."""
    global _WORK_CORPUS
    if _WORK_CORPUS is None:
        sys.path.insert(0, REPO)
        from whakoom_webscrapper_spark import datagen, imaging

        corpus = []
        for i in range(120):
            px = datagen.pixels_of(i)
            fmt = datagen.fmt_of(i)
            corpus.append(
                (imaging.encode_image(px, fmt), fmt, px,
                 datagen.html_of(i, 300_000, 8000, 12))
            )
        _WORK_CORPUS = corpus
    return _WORK_CORPUS


def _workload_compute(seed: int) -> int:
    """One unit = the crawl's per-page Python work over the fixed
    120-page corpus (decode + validate + featurize + extract)."""
    corpus = _workload_corpus()
    sys.path.insert(0, REPO)
    from whakoom_webscrapper_spark import imaging
    from whakoom_webscrapper_spark.operators import extract as X

    n = 0
    for blob, fmt, px, html in corpus:
        decoded = imaging.decode_image(blob, fmt)
        imaging.phash64(decoded)
        imaging.psnr(decoded, px)
        imaging.features64(decoded, 6)
        X.list_links(html)
        n += 1
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=400_000)
    ap.add_argument("--hosts", type=int, default=8000)
    ap.add_argument("--fanout", type=int, default=12)
    ap.add_argument("--seeds", type=int, default=8000)
    ap.add_argument("--budget-scale", type=int, default=4)
    ap.add_argument("--max-epochs", type=int, default=4)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--seen-filter", default="bloom",
                    choices=["bloom", "cuckoo"])
    ap.add_argument("--out", default="/tmp/scalebench")
    ap.add_argument("--masters", nargs=2, default=["local[8]", "local[32]"])
    ap.add_argument("--repeat", type=int, default=1,
                    help="repetitions, interleaved small/big to decorrelate "
                         "shared-host drift; efficiency reported as the "
                         "median of per-repetition ratios")
    ap.add_argument("--json", default=os.path.join(REPO, "BENCH", "scaling.json"),
                    help="output artifact path (flushed incrementally: the "
                         "ceiling control lands first, then every completed "
                         "run — an interrupted campaign still leaves evidence)")
    ap.add_argument("--skip-ceiling", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="load an existing --json artifact and run only the "
                         "missing legs/controls (a campaign killed mid-rep "
                         "keeps its completed measurements)")
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
            env=dict(os.environ, SPARK_GRAFT_DRIVER_MEM="12g"),
        )
        if not os.path.exists(os.path.join(world, "linkgraph")):
            raise RuntimeError(f"world gen failed:\n{gen.stderr[-2000:]}")

    small_master, big_master = args.masters
    n_small = int(small_master.split("[")[1].rstrip("]"))
    n_big = int(big_master.split("[")[1].rstrip("]"))

    # The artifact is flushed after EVERY completed step — the round-3
    # campaign died with its JSON unwritten, leaving a results table citing
    # a file that never existed; never again. Partial state is labeled.
    result = {
        "protocol": "same job, same world, fresh state, separate JVMs; "
                    f"median of {args.repeat} interleaved repetitions; "
                    "ceiling control measured first; artifact flushed "
                    "after every completed run",
        "status": "in-progress",
        "world": {
            "n_urls": args.n_urls, "hosts": args.hosts, "fanout": args.fanout,
            "seeds": args.seeds, "budget_scale": args.budget_scale,
            "max_epochs": args.max_epochs,
        },
        "masters": [small_master, big_master],
        "runs": [],
        "target": 0.8,
    }
    if args.resume and os.path.exists(args.json):
        with open(args.json) as f:
            prior = json.load(f)
        if prior.get("masters") != [small_master, big_master] or \
                prior.get("world", {}) != result["world"]:
            raise SystemExit("--resume: existing artifact was measured with "
                             "different masters/world; refusing to mix")
        result = prior
        result["status"] = "in-progress"

    def flush() -> None:
        effs = sorted(
            r["efficiency"] for r in result["runs"] if "efficiency" in r
        )
        if effs:
            result["efficiencies"] = effs
            result["scaling_efficiency"] = effs[len(effs) // 2]
        norm = sorted(
            r["efficiency_vs_control"]
            for r in result["runs"]
            if "efficiency_vs_control" in r
        )
        if norm:
            result["efficiencies_vs_control"] = norm
            result["scaling_efficiency_vs_control"] = norm[len(norm) // 2]
        tmp = args.json + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=2)
        os.replace(tmp, args.json)

    # Ceiling control FIRST: it is cheap (~1 min) and the crawl number is
    # only interpretable against it — an interrupted campaign must still
    # hold the control.
    if not args.skip_ceiling and "machine_ceiling_control" not in result:
        result["frequency_probe_per_proc_rate"] = frequency_probe()
        print(f"freq probe: {result['frequency_probe_per_proc_rate']}",
              file=sys.stderr)
        flush()
        result["machine_ceiling_control"] = machine_ceiling(n_small, n_big)
        print(f"ceiling: {result['machine_ceiling_control']}", file=sys.stderr)
    flush()

    # Interleave A/B within each repetition so slow drift in shared-host
    # load hits both sides of a ratio, not just one; identical row counts
    # across every run re-verify determinism each repetition.
    for rep in range(args.repeat):
        if rep < len(result["runs"]):
            entry = result["runs"][rep]  # --resume: keep completed legs
        else:
            entry = {"rep": rep}
            result["runs"].append(entry)
        if small_master not in entry:
            entry[small_master] = run_crawl(
                args, small_master,
                small_master.replace("[", "_").replace("]", ""))
            flush()
        r_small = entry[small_master]
        if big_master not in entry:
            entry[big_master] = run_crawl(
                args, big_master,
                big_master.replace("[", "_").replace("]", ""))
        r_big = entry[big_master]
        assert r_small["fetched"] == r_big["fetched"], "nondeterminism!"
        eff = (r_big["urls_per_sec"] / r_small["urls_per_sec"]) / (n_big / n_small)
        entry["efficiency"] = round(eff, 3)
        flush()
        if "control" not in entry:
            # the same-regime hardware control, inside the repetition
            ctl = workload_control(n_small, n_big)
            entry["control"] = ctl
            if ctl["efficiency"] > 0:
                entry["efficiency_vs_control"] = round(
                    eff / ctl["efficiency"], 3)
            flush()
        print(f"rep {rep}: eff={eff:.3f} "
              f"ctl={entry['control']['efficiency']:.3f} "
              f"({r_small['urls_per_sec']} vs {r_big['urls_per_sec']} urls/s)",
              file=sys.stderr)

    result["status"] = "complete"
    flush()
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
