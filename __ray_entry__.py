"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) initialises or shuts down Ray.

- ``entry()``: flagship frontier-crawl pipeline over a deterministic
  corpus sized for /root/testdata/sf0.001; returns the stored-pages
  Dataset.
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 plus the training-data operators (dedup, similarity
  search, text analysis, multimodal, windows) and the crawl pipelines.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query (column names match the Ray outputs exactly). Crawl rounds,
  LSH approximations and hash fingerprints are rows-only by design;
  their correctness is covered by the golden-parity tests in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    from ethereum_raw_data_crawler_ray.pipelines.queries import q40_crawl_pages

    return q40_crawl_pages("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ethereum_raw_data_crawler_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ethereum_raw_data_crawler_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
