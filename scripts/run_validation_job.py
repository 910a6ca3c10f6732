"""Cluster job driver for the flagship validation pipeline.

Submit on a real cluster:

    ray job submit --working-dir . -- \
        python scripts/run_validation_job.py \
            --input /data/images --output /data/validated \
            [--checkpoint-dir /data/validated/_checkpoint] \
            [--psnr 40] [--no-resume] [--decode-batch-size 512]

Locally it auto-inits a local Ray session (guarded — within `ray job
submit` the session already exists). Exit code 0 iff every fragment passed
and no duplicate image ids were found; the full report is printed as one
JSON object on stdout, per-fragment lineage goes to the checkpoint dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--input", required=True,
        help="directory of parquet fragments, or a Lance dataset "
             "(auto-detected; requires the pylance package)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--psnr", type=float, default=40.0)
    ap.add_argument("--decode-batch-size", type=int, default=512)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    from polars_genson_ray.pipelines.validation import (
        ValidationConfig,
        run_validation,
    )

    report = run_validation(
        args.input,
        args.output,
        checkpoint_dir=args.checkpoint_dir,
        config=ValidationConfig(
            psnr_threshold=args.psnr, decode_batch_size=args.decode_batch_size
        ),
        resume=not args.no_resume,
    )
    print(
        json.dumps(
            {
                "rows": report.rows,
                "fragments": len(report.fragments),
                "passed": report.passed(),
                "violation_counts": report.violation_counts,
                "duplicate_image_ids": report.duplicate_image_ids[:100],
                "hot_phash_buckets": report.hot_phash_buckets,
                "stats": report.stats,
                "drift": {
                    os.path.basename(k): v for k, v in report.drift.items()
                },
                "schema_digest_fields": sorted(
                    report.schema.get("properties", {})
                )[:50],
                "timings": report.timings,
            },
            default=str,
        )
    )
    ray.shutdown()
    return 0 if report.passed() else 1


if __name__ == "__main__":
    sys.exit(main())
