"""Two-parallelism scaling evidence (north_rule: >=0.8 efficiency N->4N).

No real cluster exists in this sandbox, so the same job runs at two
local parallelism levels (local[N] vs local[4N]) over the SAME
pre-generated input, per BASELINE.md.

"Same job" is taken literally: the data layout — shuffle partition
count, build write_partitions, and (via build.py keying its scan-split
sizing off write_partitions) the docs-scan split size — is FIXED across
both legs; only the core count varies. That is how a real N->4N cluster
test works (the job config doesn't change when you add executors), and
it is also what makes the comparison honest on this box: scaling the
partition count with cores gave the 1-core leg one giant postings
partition and ~64 MiB analyzer splits, whose spill/memory churn
inflated its time superlinearly and fabricated >1.0 "efficiencies".

Single-config mode (subprocess):
    python tools/scaling_run.py --cores 8 --partitions 16 \
        --input /tmp/scaling_corpus

Orchestrator mode (runs both, writes bench_scaling.json + prints table):
    python tools/scaling_run.py --turns 200000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_RANKED = ["spark index fast", "test document", "shuffle partition cluster"]
QUERIES_BOOL = ['data + "test document"', "spark cluster"]


def cpu_probe() -> float:
    """Fixed single-core numpy workload (seconds). The sandbox VM is
    intermittently CPU-throttled by neighbors (same sort measured 1.8 s
    and 18.5 s an hour apart); recording the probe per leg makes each
    measurement's machine health part of the record."""
    import numpy as np

    a = np.random.default_rng(0).integers(0, 1 << 40, 10_000_000)
    # warm the allocator first: np.sort returns a copy, and the first
    # call in a fresh process pays ~80 MB of page faults inside the
    # timed section (measured 3-5 s cold vs 0.2 s warm on an idle box)
    np.sort(a[: a.size // 4])
    t0 = time.time()
    np.sort(a)
    return round(time.time() - t0, 2)


def run_one(cores: int, input_path: str, partitions: int) -> dict:
    from search_engine_spark.engine import TranscriptSearchEngine
    from search_engine_spark.session import get_spark

    probe = cpu_probe()
    t_leg0 = time.time()

    # partitions (shuffle width + build write_partitions) is part of the
    # JOB, not the leg: both legs get the same value so per-task working
    # sets are identical and only concurrency differs
    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=partitions,
    )
    transcripts = spark.read.parquet(input_path)
    n_turns = transcripts.count()

    # warmup build: JVM JIT, Python UDF worker pool, shuffle/codegen
    # caches — one-time per-session costs that a production-scale build
    # amortizes away; the MEASURED build is the steady-state second one
    index_dir = f"/tmp/scaling_index_{cores}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    TranscriptSearchEngine.build(
        spark, transcripts, index_dir, write_partitions=partitions
    )
    warmup_secs = time.time() - t0
    shutil.rmtree(index_dir, ignore_errors=True)
    # gate the MEASURED build on a healthy probe: the neighbor-steal
    # windows on this VM last minutes; waiting here shrinks the
    # throttle-exposed section of the leg to the measured build itself
    probe_ok = float(os.environ.get("SCALING_PROBE_OK", "3.0"))
    mid = cpu_probe()
    for _ in range(int(os.environ.get("SCALING_MID_WAITS", "10"))):
        if mid <= probe_ok:
            break
        time.sleep(60)
        mid = cpu_probe()
    # watchdog: sample the probe INSIDE the measured window. Edge
    # probes cannot see a steal window that opens and closes mid-build
    # (observed: a 578 s 4-core build — 3.3x its healthy 175 s — with
    # 2.3/2.5 s probes on both edges). The box has 32 vCPUs and the
    # legs use at most `cores`+driver, so a ~1 s single-core probe
    # every 45 s runs on an otherwise-idle vCPU and costs the build
    # nothing unless the HOST is stealing — which is exactly the
    # signal. Both legs pay the identical (negligible) tax.
    import threading

    during: list[float] = []
    stop = threading.Event()

    def _watch():
        while not stop.wait(45.0):
            during.append(cpu_probe())

    watcher = threading.Thread(target=_watch, daemon=True)
    watcher.start()
    t0 = time.time()
    eng = TranscriptSearchEngine.build(
        spark, transcripts, index_dir, write_partitions=partitions
    )
    build_secs = time.time() - t0
    stop.set()
    watcher.join(timeout=30)
    # post-probe immediately after the measured build (before queries):
    # [mid, during..., post] brackets exactly the timing the efficiency
    # uses
    post = cpu_probe()

    # steady-state query batch (caches + workers warmed first;
    # doc_stats deliberately untouched — no query path reads it)
    eng.terms.count(), eng.postings.count(), eng.kgrams.count()
    eng.ranked_query("warmup")
    t0 = time.time()
    ranked = {q: eng.ranked_query(q) for q in QUERIES_RANKED}
    boolean = {q: eng.boolean_query(q) for q in QUERIES_BOOL}
    query_secs = time.time() - t0

    # per-phase attribution (tf/postings/vocab) from the build's own
    # metrics — lets a reviewer see WHICH phase failed to scale instead
    # of guessing from end-to-end wall time
    try:
        with open(os.path.join(index_dir, "build_metrics.json")) as f:
            phases = json.load(f).get("chunks", [{}])[0].get("phases", {})
    except Exception:
        phases = {}

    return {
        "cores": cores,
        "partitions": partitions,
        "n_turns": n_turns,
        "cpu_probe_secs": probe,
        # probe right before the measured build (post-gate) and AFTER
        # the queries: shared-VM throttling that arrives mid-leg (the
        # failure mode a single pre-probe misses) shows up here
        "cpu_probe_mid_secs": mid,
        "cpu_probe_during_max_secs": round(max(during), 2) if during else 0.0,
        "cpu_probe_during_secs": during,
        "cpu_probe_post_secs": post,
        "leg_wall_secs": round(time.time() - t_leg0, 2),
        "warmup_build_secs": round(warmup_secs, 2),
        "build_secs": round(build_secs, 2),
        "build_phases": phases,
        "build_turns_per_sec": round(n_turns / build_secs, 2),
        "query_batch_secs": round(query_secs, 2),
        "ranked_results": {
            q: [(int(d), round(s, 9)) for d, s in r] for q, r in ranked.items()
        },
        "boolean_counts": {q: len(r) for q, r in boolean.items()},
    }


def orchestrate(turns: int, cores_lo: int, cores_hi: int, repeats: int,
                partitions: int) -> None:
    """Interleaved repeated runs: lo, hi, lo, hi, ... so shared-VM noise
    hits both legs alike; the headline is the MEDIAN efficiency across
    repeats (a single pair can ride one throttled leg)."""
    import statistics

    from search_engine_spark.fixtures import synthetic_transcripts
    from search_engine_spark.session import get_spark

    input_path = os.environ.get("SCALING_CORPUS", "/tmp/scaling_corpus")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        spark = get_spark(app_name="scaling-gen", master="local[32]",
                          shuffle_partitions=32)
        synthetic_transcripts(spark, n_convs=turns // 10, turns_per_conv=10,
                              num_partitions=64).write.mode("overwrite").parquet(input_path)
        spark.stop()

    def one(cores: int) -> dict | None:
        out = subprocess.run(
            [sys.executable, __file__, "--cores", str(cores),
             "--partitions", str(partitions), "--input", input_path],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if out.returncode != 0:
            # surface the child's failure instead of aborting the whole
            # campaign (a lost leg costs one pair, not the session) —
            # and KEEP the stderr tail: a swallowed traceback once cost
            # a 25-minute diagnosis round-trip
            print(f"# leg cores={cores} FAILED (exit {out.returncode}):",
                  file=sys.stderr)
            for line in out.stderr.strip().splitlines()[-15:]:
                print(f"#   {line}", file=sys.stderr)
            return None
        return json.loads(out.stdout.strip().splitlines()[-1])

    # a pair is HEALTHY when all four bracketing probes (pre+post of
    # both legs) stay under the throttle threshold — the VM is known to
    # be intermittently CPU-stolen by neighbors, and a throttle window
    # landing inside one leg fabricates arbitrary efficiency numbers in
    # either direction. Keep sampling (up to `repeats` pairs) until
    # `need_healthy` clean pairs exist; the headline is the median over
    # clean pairs (all pairs, flagged, if the VM never calms down).
    probe_ok = float(os.environ.get("SCALING_PROBE_OK", "3.0"))
    need_healthy = int(os.environ.get("SCALING_HEALTHY_PAIRS", "1"))

    def healthy(pair) -> bool:
        # edge probes AND the in-build watchdog maxima: a pair is clean
        # only if no sample anywhere inside either measured window saw
        # the host stealing
        return all(
            leg[k] <= probe_ok
            for leg in (pair["lo"], pair["hi"])
            for k in ("cpu_probe_mid_secs", "cpu_probe_during_max_secs",
                      "cpu_probe_post_secs")
        )

    pairs = []
    # skips don't consume the repeat budget — a long steal window would
    # otherwise eat every repeat in 60 s sleeps; the wall cap bounds the
    # total wait instead
    deadline = time.time() + float(
        os.environ.get("SCALING_WALL_CAP_SECS", str(4 * 3600))
    )
    r = 0
    while r < repeats and time.time() < deadline:
        pre = cpu_probe()
        if pre > probe_ok:
            print(f"# waiting: VM throttled (probe {pre}s)", file=sys.stderr)
            time.sleep(60)
            continue
        r += 1
        # hi (short) leg first: the steal windows on this VM last
        # minutes, so the leg least able to hide them runs while the
        # pre-probe verdict is freshest
        hi = one(cores_hi)
        lo = one(cores_lo) if hi is not None else None
        if hi is None or lo is None:
            continue
        eff = (lo["build_secs"] / hi["build_secs"]) / (cores_hi / cores_lo)
        pairs.append({"repeat": r, "lo": lo, "hi": hi,
                      "efficiency": round(eff, 3)})
        print(f"# repeat {r}: {cores_lo}c {lo['build_secs']}s "
              f"(probes {lo['cpu_probe_mid_secs']}/"
              f"{lo['cpu_probe_during_max_secs']}max/"
              f"{lo['cpu_probe_post_secs']}s), "
              f"{cores_hi}c {hi['build_secs']}s "
              f"(probes {hi['cpu_probe_mid_secs']}/"
              f"{hi['cpu_probe_during_max_secs']}max/"
              f"{hi['cpu_probe_post_secs']}s), "
              f"eff {eff:.3f} healthy={healthy(pairs[-1])}",
              file=sys.stderr)
        if sum(healthy(p) for p in pairs) >= need_healthy:
            break

    if not pairs:
        print("# no pairs ran (VM throttled throughout)", file=sys.stderr)
        return
    clean = [p for p in pairs if healthy(p)]
    effs = [p["efficiency"] for p in (clean or pairs)]
    lo0 = pairs[0]["lo"]
    summary = {
        "n_turns": lo0["n_turns"],
        "cores": [cores_lo, cores_hi],
        "partitions": partitions,
        "repeats": len(pairs),
        "healthy_pairs": len(clean),
        "probe_threshold_secs": probe_ok,
        "build_secs_lo": [p["lo"]["build_secs"] for p in pairs],
        "build_secs_hi": [p["hi"]["build_secs"] for p in pairs],
        "build_turns_per_sec_best_hi": max(
            p["hi"]["build_turns_per_sec"] for p in pairs
        ),
        "cpu_probe_secs": [
            [p["lo"]["cpu_probe_mid_secs"],
             p["lo"]["cpu_probe_during_max_secs"],
             p["lo"]["cpu_probe_post_secs"],
             p["hi"]["cpu_probe_mid_secs"],
             p["hi"]["cpu_probe_during_max_secs"],
             p["hi"]["cpu_probe_post_secs"]]
            for p in pairs
        ],
        "efficiencies": effs,
        "efficiency_over": "healthy pairs" if clean else "ALL pairs (none healthy)",
        "scaling_efficiency_median": round(statistics.median(effs), 3),
        "scaling_efficiency_min": min(effs),
        "scaling_efficiency_max": max(effs),
        "rank_identical_across_parallelism": all(
            p["lo"]["ranked_results"] == p["hi"]["ranked_results"] for p in pairs
        ),
        "boolean_counts_equal": all(
            p["lo"]["boolean_counts"] == p["hi"]["boolean_counts"] for p in pairs
        ),
    }
    with open("bench_scaling.json", "w") as f:
        json.dump({"summary": summary, "pairs": pairs}, f, indent=1)
    print(json.dumps(summary, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--input")
    ap.add_argument("--turns", type=int, default=200_000)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    # fixed job-wide layout; default 4 tasks/core at the WIDE leg so the
    # narrow leg just runs the same tasks with less concurrency
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()
    partitions = args.partitions or 4 * args.hi
    if args.cores:
        print(json.dumps(run_one(args.cores, args.input, partitions)))
    else:
        orchestrate(args.turns, args.lo, args.hi, args.repeats, partitions)


if __name__ == "__main__":
    main()
