"""Cluster entry point: run the training-data curation pipeline via
spark-submit — the ops-side counterpart of ``tools/submit_build.py``.

quality gate -> language gate -> exact dedup -> MinHash-LSH near-dup
components -> (optional) stratified sample -> (optional) context
packing -> sharded compressed-JSONL export, all as the library's
composed lazy plans; the same script runs on local[N] and on a
multi-executor cluster:

    PYFILES=$(python -c "from search_engine_spark.session import package_zip; print(package_zip())")
    spark-submit --py-files "$PYFILES" tools/curate_run.py \
        --input /data/documents_parquet \
        --output /data/curated_shards \
        [--min-quality 0.75] [--langs en,de] \
        [--near-dup-threshold 0.7] \
        [--sample en=0.5,de=1.0] \
        [--pack-budget 2048 --pack-group source] \
        [--shard-rows 100000]

Prints one JSON line: {"n_input": ..., "n_curated": ..., "n_written": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="shard output directory")
    ap.add_argument("--min-quality", type=float, default=0.75)
    ap.add_argument("--langs", default=None,
                    help="comma-separated allowed languages (default: all non-und)")
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument("--sample", default=None,
                    help="lang=rate,... final stratified sample")
    ap.add_argument("--pack-budget", type=int, default=None,
                    help="pack curated texts into ~N-token training windows")
    ap.add_argument("--pack-group", default="source",
                    help="grouping column for packing (default: source)")
    ap.add_argument("--shard-rows", type=int, default=100_000)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    from search_engine_spark.ops import packing, pipeline
    from search_engine_spark.ops.export import write_training_shards

    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    sample_fracs = None
    if args.sample:
        sample_fracs = {
            part.split("=")[0]: float(part.split("=")[1])
            for part in args.sample.split(",")
        }
    kept = pipeline.curate(
        docs,
        min_quality=args.min_quality,
        allowed_langs=args.langs.split(",") if args.langs else None,
        near_dup_threshold=args.near_dup_threshold,
        sample_fracs=sample_fracs,
    )
    curated = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    n_curated = curated.count()

    if args.pack_budget:
        out_df = packing.pack_texts(
            curated,
            args.pack_budget,
            group_col=args.pack_group,
            order_col="doc_id",
        )
    else:
        out_df = curated
    n_written = write_training_shards(
        out_df, args.output, max_records_per_file=args.shard_rows
    )
    metrics = {
        "n_input": n_input,
        "n_curated": n_curated,
        "n_written": n_written,
    }
    json.dump(metrics, sys.stdout)
    print()
    return metrics


if __name__ == "__main__":
    main()
