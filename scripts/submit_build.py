#!/usr/bin/env python
"""spark-submit entrypoint for the index build / merge / query jobs.

Cluster usage (the 10^12-turn path):

    scripts/package.sh                           # -> dist/cuely_spark.zip
    spark-submit --py-files dist/cuely_spark.zip \\
        scripts/submit_build.py build \\
        --input  <iceberg-or-parquet path of transcripts> \\
        --output <index root> \\
        --rows-per-segment 4000000 --num-jobs 64 [--resume]

    spark-submit --py-files dist/cuely_spark.zip \\
        scripts/submit_build.py merge --input <idx> --output <merged> \\
        --target-segments 128 --hot-df 500000

    spark-submit --py-files dist/cuely_spark.zip \\
        scripts/submit_build.py search --input <idx> -q "example website" -k 20

In local mode it runs on an existing/implicit SparkSession; on a real
cluster master/deploy-mode come from spark-submit. `--resume` restarts
a failed build from its per-job manifests.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--format", default="parquet",
                   choices=["parquet", "iceberg"],
                   help="iceberg reads --input as a table identifier")
    b.add_argument("--text-col", default="text")
    b.add_argument("--order-cols", default="conv_id,turn_idx")
    b.add_argument("--rows-per-segment", type=int, default=100_000)
    b.add_argument("--num-jobs", type=int, default=1)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--resume", action="store_true")
    b.add_argument("--attr-cols", default="",
                   help="comma-separated unscored field:value filter "
                        "columns (e.g. role,tool)")
    b.add_argument("--field-cols", default="",
                   help="comma-separated extra SCORED text fields "
                        "(multi-field postings for BM25F)")
    b.add_argument("--ngram-max", type=int, default=0,
                   help="0/2/3: bigram(+trigram) compound shadow terms")
    b.add_argument("--stem", action="store_true",
                   help="index stemmed shadow terms")
    b.add_argument("--stem-lang-col", default=None,
                   help="column with per-doc language codes routing "
                        "the stemmer (en/de/fr/es, en fallback)")
    b.add_argument("--score-col", default=None,
                   help="index-sort: assign doc ids by this column "
                        "descending (early-termination ordering)")

    m = sub.add_parser("merge")
    m.add_argument("--input", required=True)
    m.add_argument("--output", required=True)
    m.add_argument("--target-segments", type=int, default=1)
    m.add_argument("--hot-df", type=int, default=500_000)

    s = sub.add_parser("search")
    s.add_argument("--input", required=True)
    s.add_argument("-q", "--query", required=True)
    s.add_argument("-k", type=int, default=20)

    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName(f"cuely-{args.cmd}")
             .getOrCreate())

    if args.cmd == "build":
        from cuely_spark.indexer import build_index

        src = (spark.read.format("iceberg").load(args.input)
               if args.format == "iceberg"
               else spark.read.parquet(args.input))
        paths = build_index(
            spark, src, args.output,
            text_col=args.text_col,
            order_cols=tuple(args.order_cols.split(",")),
            rows_per_segment=args.rows_per_segment,
            num_jobs=args.num_jobs,
            store_positions=not args.no_positions,
            resume=args.resume,
            attr_cols=tuple(c for c in args.attr_cols.split(",") if c),
            field_cols=tuple(c for c in args.field_cols.split(",") if c),
            ngram_max=args.ngram_max,
            stem=args.stem,
            stem_lang_col=args.stem_lang_col,
            score_col=args.score_col,
        )
        print(f"index built at {paths.root}")
    elif args.cmd == "merge":
        from cuely_spark.indexer import merge_segments

        paths = merge_segments(spark, args.input, args.output,
                               target_segments=args.target_segments,
                               hot_df_threshold=args.hot_df)
        print(f"merged index at {paths.root}")
    else:
        from cuely_spark.queryengine import IndexReader

        r = IndexReader(spark, args.input)
        r.search(args.query, k=args.k, with_meta=True).show(
            args.k, truncate=False)


if __name__ == "__main__":
    sys.exit(main())
