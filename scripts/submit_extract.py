#!/usr/bin/env python
"""spark-submit job: the flagship extraction pipeline on a (standalone)
cluster — the north rule's deployment shape (`spark-submit --py-files` on a
multi-executor cluster).

Usage:
    spark-submit --master spark://HOST:7077 \
        --py-files ldos_pkg.zip \
        scripts/submit_extract.py --sf-dir /root/testdata/sf0.1 --replicas 100

Prints ONE JSON line: {"docs": N, "elapsed_sec": T, "docs_per_sec": R,
"executors": E, "total_cores": C}.

The SparkSession comes from spark-submit's conf (no master/.config here —
the deployment, not the job, decides the cluster); only semantic settings
(timezone, Arrow, AQE) are applied, mirroring session.build_session.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--no-fields", action="store_true")
    ap.add_argument("--dup-rate", type=float, default=0.0)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ldos-submit-extract")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from legal_document_ocr_spark.sources.pages import synthesize_scaled_pages_df
    from legal_document_ocr_spark.stages import run_extraction

    pages = synthesize_scaled_pages_df(
        spark, args.sf_dir, args.replicas, dup_rate=args.dup_rate
    )
    n = pages.count()

    def one_run() -> float:
        t0 = time.time()
        run_extraction(
            pages, dedup=not args.no_dedup, with_fields=not args.no_fields
        ).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for _ in range(args.warmup):
        one_run()
    best = min(one_run() for _ in range(args.runs))

    sc = spark.sparkContext
    # executor set (minus the driver entry)
    n_exec = max(
        len([e for e in sc._jsc.sc().statusTracker().getExecutorInfos()]) - 1, 0
    )
    total_cores = int(sc.getConf().get("spark.cores.max", "0") or 0)
    print(
        json.dumps(
            {
                "docs": n,
                "elapsed_sec": round(best, 3),
                "docs_per_sec": round(n / best, 1),
                "executors": n_exec,
                "total_cores": total_cores,
                "master": sc.master,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
