"""Two-parallelism scaling evidence (north_rule: >=0.8 efficiency N->4N).

No real cluster exists in this sandbox, so the same job runs at two
local parallelism levels (local[N] vs local[4N], shuffle partitions
scaled with cores) over the SAME pre-generated input, per BASELINE.md.

Single-config mode (subprocess):
    python tools/scaling_run.py --cores 8 --input /tmp/scaling_corpus

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


def run_one(cores: int, input_path: str) -> dict:
    from search_engine_spark.engine import TranscriptSearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    transcripts = spark.read.parquet(input_path)
    n_turns = transcripts.count()

    index_dir = f"/tmp/scaling_index_{cores}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    eng = TranscriptSearchEngine.build(
        spark, transcripts, index_dir, write_partitions=cores
    )
    build_secs = time.time() - t0

    # steady-state query batch (caches + workers warmed first)
    eng.terms.count(), eng.postings.count(), eng.doc_stats.count(), eng.kgrams.count()
    eng.ranked_query("warmup")
    t0 = time.time()
    ranked = {q: eng.ranked_query(q) for q in QUERIES_RANKED}
    boolean = {q: eng.boolean_query(q) for q in QUERIES_BOOL}
    query_secs = time.time() - t0

    return {
        "cores": cores,
        "n_turns": n_turns,
        "build_secs": round(build_secs, 2),
        "build_turns_per_sec": round(n_turns / build_secs, 2),
        "query_batch_secs": round(query_secs, 2),
        "ranked_results": {
            q: [(int(d), round(s, 9)) for d, s in r] for q, r in ranked.items()
        },
        "boolean_counts": {q: len(r) for q, r in boolean.items()},
    }


def orchestrate(turns: int, cores_lo: int, cores_hi: int) -> None:
    from search_engine_spark.fixtures import synthetic_transcripts
    from search_engine_spark.session import get_spark

    input_path = os.environ.get("SCALING_CORPUS", "/tmp/scaling_corpus")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        spark = get_spark(app_name="scaling-gen", master="local[32]",
                          shuffle_partitions=32)
        synthetic_transcripts(spark, n_convs=turns // 10, turns_per_conv=10,
                              num_partitions=64).write.mode("overwrite").parquet(input_path)
        spark.stop()

    results = {}
    for cores in (cores_lo, cores_hi):
        out = subprocess.run(
            [sys.executable, __file__, "--cores", str(cores), "--input", input_path],
            capture_output=True, text=True, check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = results[cores_lo], results[cores_hi]
    ratio = lo["build_secs"] / hi["build_secs"]
    eff = ratio / (cores_hi / cores_lo)
    rank_identical = lo["ranked_results"] == hi["ranked_results"]
    summary = {
        "n_turns": lo["n_turns"],
        "cores": [cores_lo, cores_hi],
        "build_secs": [lo["build_secs"], hi["build_secs"]],
        "build_turns_per_sec": [lo["build_turns_per_sec"], hi["build_turns_per_sec"]],
        "query_batch_secs": [lo["query_batch_secs"], hi["query_batch_secs"]],
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "rank_identical_across_parallelism": rank_identical,
        "boolean_counts_equal": lo["boolean_counts"] == hi["boolean_counts"],
    }
    with open("bench_scaling.json", "w") as f:
        json.dump({"summary": summary, "runs": results}, f, indent=1)
    print(json.dumps(summary, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--input")
    ap.add_argument("--turns", type=int, default=200_000)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(run_one(args.cores, args.input)))
    else:
        orchestrate(args.turns, args.lo, args.hi)


if __name__ == "__main__":
    main()
