"""HTML text extraction — the engine's core per-record transform.

Analog of the reference's ``convertTransaction``
(``ethereum_service.go:459-576``): the per-unit payload parser. Its
4-signer fallback chain (London → EIP-155 → Homestead → Frontier,
``:493-529``) maps to a 3-level parser fallback chain here:

  1. strict  — the page follows the expected ``<article><p>…`` structure;
  2. lenient — strip all tags from <body>, unescape entities;
  3. raw     — bytes decoded utf-8-with-replacement.

The per-row invariant (BASELINE.json input_hint) is that ``extract_text``
recovers the input table's ``text`` column **byte-identically** for every
synthetic page produced by :func:`render_html`.

All functions operate per batch (list/ndarray in, ndarray out); the
regexes are compiled once at module import (the analog of per-actor setup
cost — module import happens once per Ray worker process).
"""

from __future__ import annotations

import html as _html
import re

import numpy as np

_STRICT_RE = re.compile(rb"<article><p>(.*?)</p></article>", re.DOTALL)
_BODY_RE = re.compile(rb"<body>(.*)</body>", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")
_HREF_RE = re.compile(rb'<a href="([^"]*)"')


def render_html(text: str, title: str, outlinks: list[str]) -> bytes:
    """Deterministic synthetic page. Inverse of the strict extractor:
    ``extract_text(render_html(t, ...)) == t`` byte-identically."""
    links = "".join(
        f'<li><a href="{_html.escape(u, quote=True)}">l{i}</a></li>'
        for i, u in enumerate(outlinks)
    )
    doc = (
        "<html><head><title>"
        + _html.escape(title)
        + '</title><meta charset="utf-8"></head><body>'
        + "<article><p>"
        + _html.escape(text, quote=False)
        + "</p></article>"
        + "<nav><ul>"
        + links
        + "</ul></nav>"
        + "</body></html>"
    )
    return doc.encode("utf-8")


def extract_text_one(raw: bytes) -> tuple[str, str]:
    """(text, parser_used). Fallback chain mirrors the reference's
    sender-recovery chain (ethereum_service.go:493-529): try strict,
    fall back to progressively laxer parsers, never raise."""
    if raw is None:
        return "", "empty"
    m = _STRICT_RE.search(raw)
    if m is not None:
        return _html.unescape(m.group(1).decode("utf-8", "strict")), "strict"
    b = _BODY_RE.search(raw)
    if b is not None:
        stripped = _TAG_RE.sub(b" ", b.group(1))
        return _html.unescape(stripped.decode("utf-8", "replace")).strip(), "lenient"
    return raw.decode("utf-8", "replace"), "raw"


def extract_outlinks_one(raw: bytes) -> list[str]:
    if raw is None:
        return []
    return [
        _html.unescape(m.decode("utf-8", "replace")) for m in _HREF_RE.findall(raw)
    ]


def extract_batch(htmls) -> tuple[np.ndarray, np.ndarray]:
    """Vector form over a batch of html payloads → (text[], outlinks[]).
    Per-row regex work is the pipeline's 'useful compute'; the batch loop
    is over rows of one Arrow block inside map_batches, never the driver."""
    n = len(htmls)
    texts = np.empty(n, dtype=object)
    links = np.empty(n, dtype=object)
    for i, raw in enumerate(htmls):
        texts[i], _ = extract_text_one(raw)
        links[i] = extract_outlinks_one(raw)
    return texts, links
