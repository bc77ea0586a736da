"""S1 — deterministic boilerplate stripping (html binary -> text).

Per BASELINE.json input_hint the extracted text must be *byte-identical
per url* and a pure function of the html bytes only — no state crosses
Arrow batch boundaries. Generalizes the reference's dtype/NaN
normalization step (named_entity_recognizer.py:319-321) to page text.

Strategy: if an ``<article>...</article>`` region exists, return exactly
its inner text; otherwise strip <script>/<style>/<nav>/<footer> blocks
and remaining tags. Falls back to the input ``text`` column when html
is null (FIXTURES.md F1).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# case-insensitive + attribute-tolerant: real-world HTML mixes <SCRIPT>,
# <Article class="x">, etc.; on the planted corpus (lowercase bare tags)
# these match byte-identically to the strict forms
_ARTICLE = re.compile(rb"<article(?:\s[^>]*)?>(.*?)</article>", re.DOTALL | re.IGNORECASE)
_BLOCKS = re.compile(
    rb"<(script|style|nav|footer|header)\b[^>]*>.*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_TAGS = re.compile(rb"<[^>]+>")


def clean_html_bytes(html: bytes | None) -> str | None:
    """Pure function of the html bytes -> extracted text (deterministic)."""
    if html is None:
        return None
    m = _ARTICLE.search(html)
    if m:
        return m.group(1).decode("utf-8", errors="replace")
    stripped = _TAGS.sub(b" ", _BLOCKS.sub(b" ", html))
    return re.sub(rb"\s+", b" ", stripped).strip().decode("utf-8", errors="replace")


@F.pandas_udf(T.StringType())
def _clean_udf(html: pd.Series) -> pd.Series:
    return html.map(clean_html_bytes)


def clean_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) -> clean_pages (same keys,
    `text` = extracted-from-html when html present, else passthrough)."""
    return pages.withColumn(
        "text", F.coalesce(_clean_udf(F.col("html")), F.col("text"))
    )
