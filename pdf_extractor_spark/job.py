"""spark-submit entry point for the extraction job (north rule: runs via
``spark-submit --py-files pdf_extractor_spark.zip pdf_extractor_spark/job.py``).

Replaces the reference CLI (reference main.py:160-904 ``extract``/``batch``):

    spark-submit --py-files pdf_extractor_spark.zip pdf_extractor_spark/job.py \
        --input /path/to/documents_parquet --output /path/to/extracted_table \
        [--partitions 64] [--no-resume] [--synth N]

``--synth N`` generates the deterministic fixture corpus in-flight instead of
reading an input table (for smoke runs and benchmarks; FIXTURES.md §1).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="PySpark main-content extraction job")
    ap.add_argument("--input", help="input parquet/table dir with (url, warc_ts, html, text, lang)")
    ap.add_argument("--output", required=True, help="output table dir (snapshot catalog)")
    ap.add_argument("--partitions", type=int, default=None, help="explicit UDF-stage partitions")
    ap.add_argument("--no-resume", action="store_true", help="reprocess everything")
    ap.add_argument("--synth", type=int, default=None, help="synthesize N fixture docs as input")
    ap.add_argument("--master", default=None, help="spark master (default: local[$SPARK_GRAFT_CPUS])")
    args = ap.parse_args(argv)

    if not args.input and not args.synth:
        ap.error("one of --input or --synth is required")

    from pdf_extractor_spark.session import build_session
    from pdf_extractor_spark.pipeline import run_extraction_job

    spark = build_session(app_name="extract-job", master=args.master)
    try:
        if args.synth:
            from pdf_extractor_spark.fixtures.synth import synth_corpus

            rows = [
                (r["url"], r["warc_ts"].replace(tzinfo=None), r["html"], r["text"], r["lang"])
                for r in synth_corpus(args.synth)
            ]
            df = spark.createDataFrame(
                rows, "url string, warc_ts timestamp, html binary, text string, lang string"
            )
        else:
            df = spark.read.parquet(args.input)
        metrics = run_extraction_job(
            spark,
            df,
            args.output,
            n_partitions=args.partitions,
            resume=not args.no_resume,
        )
        print(json.dumps(metrics))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
