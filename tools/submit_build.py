"""Cluster entry point: build or append a transcript index via spark-submit.

The engine is a plain Python package, shipped to executors as a zip
(``--py-files``); the session comes from the cluster (no master/conf
hardcoded here), so the same script runs on local[N] and on a
multi-executor cluster:

    PYFILES=$(python -c "from search_engine_spark.session import package_zip; print(package_zip())")
    spark-submit --py-files "$PYFILES" tools/submit_build.py \
        --input /data/transcripts_parquet \
        --index-dir /data/index \
        [--append] [--block-span 65536] [--term-buckets 32] \
        [--chunk-docs N] [--resume]

Prints one JSON line of build metrics (rows/bytes/secs per chunk).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path/table")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--append", action="store_true",
                    help="incrementally index into an existing index")
    ap.add_argument("--resume", action="store_true",
                    help="skip chunks already committed by a failed run")
    ap.add_argument("--chunk-docs", type=int, default=None,
                    help="docs per committed chunk (rounded up to whole blocks)")
    ap.add_argument("--block-span", type=int, default=None)
    ap.add_argument("--term-buckets", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    from search_engine_spark.build import (
        DEFAULT_BLOCK_SPAN,
        DEFAULT_TERM_BUCKETS,
        IndexBuilder,
    )

    builder = IndexBuilder(
        spark,
        args.index_dir,
        block_span=args.block_span or DEFAULT_BLOCK_SPAN,
        term_buckets=args.term_buckets or DEFAULT_TERM_BUCKETS,
    )
    transcripts = (
        spark.read.parquet(args.input)
        if "/" in args.input or args.input.endswith(".parquet")
        else spark.read.table(args.input)
    )
    if args.append:
        metrics = builder.append(transcripts)
    else:
        metrics = builder.build(
            transcripts, chunk_docs=args.chunk_docs, resume=args.resume
        )
    json.dump(metrics, sys.stdout)
    print()


if __name__ == "__main__":
    main()
