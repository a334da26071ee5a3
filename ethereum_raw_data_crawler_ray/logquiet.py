"""Quiet known-benign Ray log warts so real warnings stay visible.

``pyarrow.Schema`` objects carrying file-level metadata (e.g. the pandas
metadata every pandas-written parquet file embeds) are unhashable, which
makes Ray Data's schema-dedup fast path log
``Failed to hash the schemas (for deduplication): unhashable type: 'dict'``
once per block unify — pure noise that drowns actual warnings.

Ray Data (re)configures its loggers per process from
``RAY_DATA_LOGGING_CONFIG`` (a dictConfig YAML), clobbering any level set
earlier — so the override must go through that mechanism. Call
:func:`logging_env` BEFORE ``ray.init`` and splice the result into both
``os.environ`` (driver) and the runtime env's ``env_vars`` (workers).
"""

from __future__ import annotations

import logging
import os


def logging_env() -> dict[str, str]:
    """Env vars pointing Ray Data at the repo's logging config."""
    return {
        "RAY_DATA_LOGGING_CONFIG": os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "ray_data_logging.yaml"
        )
    }


def quiet_ray_data_warts() -> None:
    """Driver-side best-effort suppression (workers need logging_env)."""
    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).setLevel(logging.ERROR)


def stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable without aiohttp.

    Ray's path resolution probes ``from fsspec.implementations.http
    import HTTPFileSystem`` on EVERY Dataset read. aiohttp is absent in
    this environment, so that import fails — and a failed import is
    retried every call (Python removes broken modules from sys.modules).
    The import machinery is not safe under CONCURRENT failing imports:
    when the round execution (main thread) and the background events
    write resolve paths simultaneously, one thread can observe the
    partially-initialized module and crash with ``ImportError: cannot
    import name 'HTTPFileSystem'`` — which Ray does NOT catch (it only
    handles ModuleNotFoundError). Installing a minimal stub makes the
    import deterministic; the stub class never matches a real filesystem
    instance, so behavior is identical to the ModuleNotFoundError path."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except ImportError:
        pass
    import sys
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # placeholder — isinstance() is always False
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
