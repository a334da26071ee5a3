"""Query CLI — run any registered pipeline over a directory of the
standard parquet tables (region nation customer supplier part orders
lineitem events documents embeddings):

    python -m ethereum_raw_data_crawler_ray.query --list
    python -m ethereum_raw_data_crawler_ray.query q01_pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--out /tmp/q01] [--num-cpus N]

Without ``--out`` the result lands on stdout as one JSON line (row
count, columns, first rows); with ``--out`` a Dataset result streams to
partitioned parquet (never materialized on the driver) and small
pandas/Arrow results are written as a single file.

Owns its Ray session ONLY when one is not already live (the driver /
tests own theirs — the __ray_entry__ contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    from .pipelines.queries import ORACLE_SQL, QUERIES

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", default=None, help="write result here as parquet")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--limit", type=int, default=5, help="preview rows on stdout")
    p.add_argument("--list", action="store_true", help="list available queries")
    args = p.parse_args(argv)

    if args.list or not args.name:
        for name in QUERIES:
            tag = "oracle" if name in ORACLE_SQL else "rows-only"
            print(f"{name}\t{tag}")
        return 0
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, **kw)
    try:
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        res = QUERIES[args.name](args.sf_dir)
        if args.out is not None:
            if isinstance(res, rd.Dataset):
                res.write_parquet(args.out)  # streams, block-partitioned
                print(json.dumps({"query": args.name, "out": args.out}))
                return 0
            tab = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
            import pyarrow.parquet as pq

            pq.write_table(tab, args.out)
            print(json.dumps(
                {"query": args.name, "out": args.out, "rows": tab.num_rows}
            ))
            return 0
        if isinstance(res, rd.Dataset):
            res = res.materialize()  # one execution serves both count and head
            df = res.limit(args.limit).to_pandas()
            n = res.count()
        else:
            df = (res.to_pandas() if isinstance(res, pa.Table) else res)
            n = len(df)
            df = df.head(args.limit)
        print(json.dumps(
            {
                "query": args.name,
                "rows": int(n),
                "columns": list(map(str, df.columns)),
                "head": json.loads(df.to_json(orient="records")),
            }
        ))
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
