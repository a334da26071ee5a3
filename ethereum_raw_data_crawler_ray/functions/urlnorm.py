"""URL normalization and host extraction.

Analog of the reference's hex block-number parsing + validation of
incoming work-unit ids (``websocket_scheduler.go:309-354``,
``handleMessage`` rejects malformed payloads; test coverage at
``websocket_scheduler_test.go:94-168``): every candidate URL entering the
frontier is canonicalized, and malformed ones are dropped rather than
crashing the round.

Rules (applied vectorized over batches):
  * scheme and host lowercased
  * fragment (``#...``) stripped
  * default ports (``:80`` http, ``:443`` https) stripped
  * empty path → ``/``
  * only http/https URLs with a non-empty host are valid
"""

from __future__ import annotations

import re

import numpy as np

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]+)(?P<rest>[/?][^#]*)?(?:#.*)?$"
)


def normalize_url(url: str) -> str | None:
    """Canonical form, or None if malformed / non-http(s)."""
    if not url:
        return None
    m = _URL_RE.match(url.strip())
    if not m:
        return None
    scheme = m.group("scheme").lower()
    if scheme not in ("http", "https"):
        return None
    host = m.group("host").lower()
    if not host or host.startswith(":"):
        return None
    if (scheme == "http" and host.endswith(":80")) or (
        scheme == "https" and host.endswith(":443")
    ):
        host = host.rsplit(":", 1)[0]
    rest = m.group("rest") or "/"
    return f"{scheme}://{host}{rest}"


def host_of(url: str) -> str:
    """Host of an already-normalized URL (politeness key, analog of the
    per-address query key ``transaction_repository_impl.go:237-266``)."""
    return url.split("/", 3)[2]


def normalize_many(urls) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vector form: (normalized_url, host, valid_mask). Invalid entries
    get empty strings and valid=False."""
    out_u = np.empty(len(urls), dtype=object)
    out_h = np.empty(len(urls), dtype=object)
    ok = np.zeros(len(urls), dtype=bool)
    for i, u in enumerate(urls):
        n = normalize_url(u) if isinstance(u, str) else None
        if n is None:
            out_u[i] = ""
            out_h[i] = ""
        else:
            out_u[i] = n
            out_h[i] = host_of(n)
            ok[i] = True
    return out_u, out_h, ok
