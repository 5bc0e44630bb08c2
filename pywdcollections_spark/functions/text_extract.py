"""html -> wikitext extraction with a byte-identical contract.

The input pages table carries both ``html:binary`` (the raw page) and
``text:string`` (the wikitext the reference harvester would have
operated on). The parity invariant (BASELINE.json input_hint) is that
``extract_text(html)`` reproduces ``text`` byte-for-byte per url.

Page html follows the MediaWiki-export-like shape the fixture
generator emits: the wikitext lives inside
``<pre class="wikitext">...</pre>`` with the five XML/HTML entities
escaped. This module is the *inverse* implemented independently from
the generator (SURVEY.md §5: no shared code between generator and
engine).

Vectorization: ``extract_text_series`` is the pandas (Arrow-batched)
entry point used by the pipeline's pandas UDF; ``extract_text`` is the
scalar core kept branch-light so pandas ``.map`` stays cheap.
"""

from __future__ import annotations

import pandas as pd

_OPEN = b'<pre class="wikitext">'
_CLOSE = b"</pre>"

# Order matters for unescaping: '&amp;' last so '&amp;lt;' round-trips.
_UNESCAPES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),
]


def extract_text(html: bytes | None) -> str | None:
    """Pull the wikitext payload out of one page's html bytes."""
    if html is None:
        return None
    start = html.find(_OPEN)
    if start < 0:
        return None
    start += len(_OPEN)
    end = html.find(_CLOSE, start)
    if end < 0:
        return None
    payload = html[start:end]
    for entity, char in _UNESCAPES:
        payload = payload.replace(entity, char)
    return payload.decode("utf-8")


def extract_text_series(html: pd.Series) -> pd.Series:
    return html.map(extract_text)
