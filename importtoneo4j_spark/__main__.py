"""spark-submit entry point (north_rule: run via spark-submit --py-files).

Usage:
  spark-submit --py-files importtoneo4j_spark.zip -m importtoneo4j_spark ...
  python -m importtoneo4j_spark --input <transcripts> --workdir <dir> \
      [--run-id run-001] [--mode overwrite|append] [--no-resume] \
      [--master local[32]] [--gen-convs N] [--no-fail-fast] \
      [--enrich <attrs.parquet>] [--enrich-best-effort] \
      [--fold-epochs <stream_output_dir>]

With --gen-convs N and no --input, generates a deterministic synthetic
corpus first (datagen.py, seed=42). --enrich runs the EP2 second pass (the
reference's ``-a`` annotation import) after materialize: the parquet must
carry entity_id plus attribute columns. --fold-epochs skips ingest/extract
and instead folds the epoch-partitioned output of
streaming/incremental.py through the batch link -> canonicalize ->
materialize stages (the lambda fold; --input is not required).
Prints a one-line JSON metrics report on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from importtoneo4j_spark.datagen import TranscriptGenerator
from importtoneo4j_spark.plans.pipeline import KGPipeline
from importtoneo4j_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="importtoneo4j_spark")
    ap.add_argument("--input", help="transcripts parquet dir or table name")
    ap.add_argument("--input-format", default=None,
                    choices=["parquet", "json", "csv", "table"],
                    help="transcripts wire format (default: infer — table "
                    "name without '/', else parquet)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--run-id", default="run-001")
    ap.add_argument("--mode", choices=["overwrite", "append"], default="overwrite")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--gen-convs", type=int, default=None)
    ap.add_argument("--no-fail-fast", action="store_true")
    ap.add_argument("--enrich", help="EP2 attribute parquet (entity_id + cols)")
    ap.add_argument("--enrich-best-effort", action="store_true",
                    help="count misses instead of aborting on them")
    ap.add_argument("--fold-epochs",
                    help="epoch-partitioned streaming extraction dir to fold "
                    "through the batch link/canonicalize/materialize stages")
    ap.add_argument("--fold-threshold", type=int, default=None,
                    help="append mode: auto-fold (full re-canonicalization) "
                    "when more than this many existing surfaces would move "
                    "to a different entity under the full fixpoint; default "
                    "off (staleness is still reported in the metrics)")
    args = ap.parse_args(argv)

    spark = get_spark("importtoneo4j_spark", master=args.master)

    input_path = args.input
    if input_path is None and args.fold_epochs is None:
        if args.gen_convs is None:
            ap.error("either --input, --gen-convs or --fold-epochs is required")
        input_path = f"{args.workdir}/_generated_transcripts"
        TranscriptGenerator().write_parquet(input_path, n_convs=args.gen_convs)

    pipe = KGPipeline(
        spark,
        input_path or "",
        args.workdir,
        run_id=args.run_id,
        mode=args.mode,
        fail_fast=not args.no_fail_fast,
        fold_threshold=args.fold_threshold,
        input_format=args.input_format,
    )
    if args.fold_epochs:
        metrics = pipe.fold_epochs(args.fold_epochs)
    else:
        metrics = pipe.run(resume=not args.no_resume)
    if args.enrich:
        pipe.enrich(
            spark.read.parquet(args.enrich),
            fail_on_miss=not args.enrich_best_effort,
        )
    print(json.dumps(metrics, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
