"""CLI entry point — the ``ray job submit`` surface (SURVEY.md §4).

    python -m pic2vec_ray featurize --images DIR_OR_PARQUET --out OUT \
        [--model tinynet] [--depth 1] [--downsample N] [--resume] [--csv CSV]
    python -m pic2vec_ray asof --left L.parquet --right R.parquet \
        --on ts --by key --out OUT [--strict]
    python -m pic2vec_ray query NAME --sf-dir DIR [--out OUT]

On a cluster: ``ray job submit --working-dir . -- python -m pic2vec_ray
featurize ...`` — the code only calls ``ray.init(address="local")``
when no session exists, so it attaches to the cluster Ray when
submitted as a job. Owns its Ray session only when standalone.
"""

from __future__ import annotations

import argparse
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_featurize(args):
    _ensure_ray()
    from .pipelines.featurize import featurize_images
    from .state.checkpoint import run_partitioned

    kwargs = dict(model_str=args.model, depth=args.depth,
                  downsample=args.downsample > 0, num_pooled_features=args.downsample)
    if args.resume:
        summary = run_partitioned(
            args.images, args.out,
            lambda ds: featurize_images(ds, **kwargs),
            num_partitions=args.partitions,
        )
        print(f"partitions ran={summary['ran']} skipped={summary['skipped']}")
    else:
        featurize_images(args.images, **kwargs).write_parquet(args.out)
        print(f"wrote {args.out}")
    if args.csv:
        import ray.data as rd

        from .pipelines.conformance import save_conformance_csv

        df = rd.read_parquet(args.out).to_pandas()
        path = save_conformance_csv(df, args.csv, image_column_header=args.image_column,
                                    model_str=args.model, depth=args.depth)
        print(f"wrote {path}")


def cmd_asof(args):
    _ensure_ray()
    import ray.data as rd

    from .temporal.asof import asof_join

    out = asof_join(
        rd.read_parquet(args.left), rd.read_parquet(args.right),
        on=args.on, by=args.by, right_on=args.right_on or args.on,
        right_by=args.right_by or args.by,
        allow_exact_matches=not args.strict, broadcast=args.broadcast,
        num_partitions=args.partitions,
    )
    out.write_parquet(args.out)
    print(f"wrote {args.out}")


def cmd_query(args):
    _ensure_ray()
    from .pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; available: {sorted(QUERIES)}", file=sys.stderr)
        return 2
    res = QUERIES[args.name](args.sf_dir)
    import ray.data

    if isinstance(res, ray.data.Dataset):
        if args.out:
            res.write_parquet(args.out)
            print(f"wrote {args.out}")
        else:
            print(res.to_pandas().head(20).to_string())
    else:
        print(res.head(20).to_string() if hasattr(res, "head") else res)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="pic2vec_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("featurize", help="decode + CNN-embed an image table")
    f.add_argument("--images", required=True, help="parquet dir of the input_hint schema")
    f.add_argument("--out", required=True)
    f.add_argument("--model", default="tinynet")
    f.add_argument("--depth", type=int, default=1)
    f.add_argument("--downsample", type=int, default=0)
    f.add_argument("--resume", action="store_true",
                   help="checkpointed per-partition run (skips completed partitions)")
    f.add_argument("--partitions", type=int, default=8)
    f.add_argument("--csv", default="", help="also write a pic2vec-conformance CSV here")
    f.add_argument("--image-column", default="images")
    f.set_defaults(fn=cmd_featurize)

    a = sub.add_parser("asof", help="point-in-time as-of join of two parquet tables")
    a.add_argument("--left", required=True)
    a.add_argument("--right", required=True)
    a.add_argument("--on", required=True)
    a.add_argument("--by", required=True)
    a.add_argument("--right-on", default="")
    a.add_argument("--right-by", default="")
    a.add_argument("--out", required=True)
    a.add_argument("--strict", action="store_true", help="ts' < ts (zero-leakage)")
    a.add_argument("--broadcast", action="store_true", help="small right side")
    a.add_argument("--partitions", type=int, default=64)
    a.set_defaults(fn=cmd_asof)

    q = sub.add_parser("query", help="run a named pipeline from the registry")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default="")
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
