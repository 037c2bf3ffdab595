"""Cluster entry point: verify index integrity via spark-submit.

Runs :func:`search_engine_spark.fsck.fsck_index` against an index and
prints one JSON line per check plus a summary; exits non-zero when any
check has violations, so it slots into maintenance schedulers next to
``tools/submit_build.py``:

    PYFILES=$(python -c "from search_engine_spark.session import package_zip; print(package_zip())")
    spark-submit --py-files "$PYFILES" tools/fsck_index.py \
        --index-dir /data/index [--deep]

``--deep`` adds the block-cogrouped weight/doclen/L2-norm cross-check
against doc_stats (one full co-shuffle — compaction's cost class; the
default pass reads each posting blob exactly once, where it lives).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--deep", action="store_true",
                    help="add the doc_stats cross-check (full co-shuffle)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    from search_engine_spark.fsck import fsck_index

    rows = fsck_index(spark, args.index_dir, deep=args.deep).collect()
    bad = 0
    for r in sorted(rows, key=lambda r: r["check"]):
        print(json.dumps(
            {"check": r["check"], "checked": r["checked"],
             "violations": r["violations"]}
        ))
        bad += int(r["violations"])
    print(json.dumps({"summary": "ok" if bad == 0 else "CORRUPT",
                      "total_violations": bad}))
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
