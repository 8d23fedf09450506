"""Encode-job CLI — the `ray job submit` entrypoint for corpus encoding.

    ray job submit -- python tools/encode_job.py \
        --input '/data/corpus/*.parquet' --output /data/stripes \
        [--columns doc_id,tokens,n_tok,source] [--compression zlib|zstd]
        [--group-by-source] [--no-resume]

Owns its Ray session (the only scripts allowed to: bench.py, CLI entry
points, the test fixture). Resume: rerunning with the same input/output
skips partitions already recorded in the manifest.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet glob")
    ap.add_argument("--output", required=True, help="stripe output directory")
    ap.add_argument("--columns", default=None, help="comma-separated projection")
    ap.add_argument("--compression", default="zlib", choices=["zlib", "zstd", "none"])
    ap.add_argument("--group-by-source", action="store_true",
                    help="source-keyed stripe packing with hot-key splitting")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local" if args.num_cpus else "auto",
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True)
    import ray.data as rd

    from apacheorcdotnet_ray.pipelines.encode import encode_corpus, encode_grouped
    from apacheorcdotnet_ray.stripe import EncodeConfig

    paths = sorted(glob.glob(args.input))
    if not paths:
        print(f"no input files match {args.input}", file=sys.stderr)
        return 2
    config = EncodeConfig(compression=args.compression)
    columns = args.columns.split(",") if args.columns else None

    if args.group_by_source:
        ds = rd.read_parquet(paths, columns=columns)
        metrics = encode_grouped(ds, args.output, config=config)
        n = metrics.count()
        summary = {"stripes": n, "mode": "grouped"}
    else:
        summary = encode_corpus(paths, args.output, config=config,
                                columns=columns, resume=not args.no_resume)
    print(json.dumps({k: v for k, v in summary.items() if k != "column_stats"}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
