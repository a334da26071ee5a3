"""Ray-Data-native URL-frontier + fetch-scheduler engine.

A brand-new rebuild of the semantics of HoiAnHub/ethereum-raw-data-crawler
(a resumable, rate-limited, deduplicating fetch-and-store scheduler — see
SURVEY.md) recast as a bounded, partition-parallel web-crawl engine over
Parquet tables of Common-Crawl-style pages, built on ray.data.Dataset
pipelines of zero-copy Arrow ``map_batches``, actor pools for stateful
stages (sharded cuckoo-filter seen set, per-host politeness), and explicit
groupby / sort / repartition for the wide steps.

Nothing here calls ``ray.init()`` / ``ray.shutdown()`` — sessions are
owned by the CLI entry points, ``bench.py`` and the test fixture.
"""

__version__ = "0.1.0"

# environment quirk: make fsspec's http module importable (no aiohttp
# here) so concurrent Dataset executions can't race its failing import —
# see logquiet.stub_fsspec_http for the full story
from .logquiet import stub_fsspec_http as _stub_fsspec_http

_stub_fsspec_http()
del _stub_fsspec_http
