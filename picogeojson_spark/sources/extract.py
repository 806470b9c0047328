"""Deterministic HTML -> text extractor.

This single pure function is the *only* text-extraction code in the repo: the
Spark pipeline calls it inside an Arrow-batched pandas UDF and the pytest
oracle calls it directly, so the per-row invariant from BASELINE.json
("byte-identical extracted text per url") holds by construction and is
asserted in tests.

Behavior:

1. payloads of ``<script type="application/geo+json">`` elements are
   preserved (they are data, not markup);
2. all other ``<script>`` and ``<style>`` elements are dropped wholesale;
3. remaining markup is stripped, a small fixed set of HTML entities is
   unescaped, and whitespace runs collapse to single spaces;
4. preserved GeoJSON payloads are appended at the end, newline-separated, so
   the downstream miner finds them in the ``text`` column.
"""

from __future__ import annotations

import re

_GEOJSON_SCRIPT = re.compile(
    r"<script[^>]*type=[\"']application/geo\+json[\"'][^>]*>(.*?)</script>",
    re.DOTALL | re.IGNORECASE,
)
_SCRIPT_OR_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE
)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

_ENTITIES = [
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
]


def extract_text(html: bytes) -> str:
    """bytes (UTF-8 HTML) -> extracted text, deterministically."""
    s = html.decode("utf-8", errors="replace")
    payloads = [m.strip() for m in _GEOJSON_SCRIPT.findall(s)]
    s = _SCRIPT_OR_STYLE.sub(" ", s)
    s = _TAG.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _WS.sub(" ", s).strip()
    if payloads:
        s = s + "\n" + "\n".join(payloads)
    return s
