"""Broadcast-side-table helper: ``ray.put`` once on the driver, fetch
once per *worker process* (not per task, not per batch) via a
module-level cache. This is the no-shuffle small-side join/lookup pattern
(ray_guide §Joins): Ray Data worker processes persist across executions,
so a crawl of 50 rounds fetches the robots table exactly once per worker.
"""

from __future__ import annotations

from typing import Any

_CACHE: dict[str, Any] = {}


def get_broadcast(ref) -> Any:
    """Resolve an ObjectRef through the per-process cache."""
    import ray

    if isinstance(ref, dict):  # already a plain value (tests, golden)
        return ref
    key = ref.hex()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
