"""WARC segment layout + CDX-style byte-offset index (Common-Crawl shape).

Common Crawl ships its corpus as WARC files plus a CDX index mapping every
record to ``(segment, byte offset, record length)`` so any page is a ranged
read away. The reference pipeline (Clearbox-AI/nerpii) consumes flat
in-memory frames (``named_entity_recognizer.py:310-311``); a web-scale KG
factory instead has to OWN this layout: the pages it reads arrive as WARC
segments and the pages it re-exports (e.g. masked variants) must be
written back with exact offsets for downstream ranged readers.

Two halves:

* ``cdx_index`` — pure length arithmetic in whole-stage codegen: each
  record's on-disk size is a closed-form function of ``octet_length(url)``
  and ``octet_length(html)`` (the WARC header is fixed text + the URL + a
  fixed-width date + the Content-Length digits), so the index needs ZERO
  byte materialization. One shuffle keyed by segment (which IS the target
  file layout — the same exchange a partitioned write would pay), then a
  running-sum window per segment; within-segment ordering is inherent to
  sequential files, not an artifact. Segments are mutually independent, so
  the plan is embarrassingly parallel across them; ``n_segments`` scales
  with the corpus (Common Crawl uses ~72k segments/crawl) keeping each
  window's partition at a bounded ~corpus/n_segments rows.

* ``build_segments`` / ``parse_segments`` — the byte path: materialize
  real WARC record bytes per segment (Arrow-batched ``applyInPandas``;
  binary concat per segment is test-scale — a production writer streams
  records to the segment file, consuming the SAME ``warc_record`` bytes)
  and parse segment blobs back by walking Content-Length (a real binary
  parser in ``mapInPandas``, no regex). pytest round-trips
  build -> parse -> compare against ``cdx_index`` so the arithmetic index
  and the byte reality can never drift.

The DuckDB oracle (``duck_cdx_sql``) rebuilds the html string inline (like
``dedup.duck_line_dedup_sql``) and replays the identical arithmetic —
``octet_length(encode(...))`` on the DuckDB side matches Spark's
``octet_length`` on UTF-8 binary/string bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import sql_h1

WARC_SALT = 53
N_SEGMENTS = 8

_H_URI = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
_H_DATE = "\r\nWARC-Date: "
_H_CLEN = "\r\nContent-Length: "
_H_END = "\r\n\r\n"
_TRAILER = "\r\n\r\n"
DATE_LEN = 20  # 'YYYY-MM-DDTHH:MM:SSZ' — fixed width by construction
# every byte of a record not contributed by url / content-length digits /
# payload (asserted against warc_record() in tests/test_wave13.py)
HEADER_FIXED = (
    len(_H_URI)
    + len(_H_DATE)
    + DATE_LEN
    + len(_H_CLEN)
    + len(_H_END)
    + len(_TRAILER)
)

DATE_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss'Z'"
DATE_FMT_PY = "%Y-%m-%dT%H:%M:%SZ"


def warc_record(url: str, date_iso: str, payload: bytes) -> bytes:
    """One WARC/1.0 response record — the byte-level contract that
    HEADER_FIXED's arithmetic summarizes (tests assert len(record) ==
    HEADER_FIXED + len(url) + len(str(len(payload))) + len(payload))."""
    head = (
        _H_URI + url + _H_DATE + date_iso + _H_CLEN + str(len(payload)) + _H_END
    ).encode("utf-8")
    return head + payload + _TRAILER.encode("utf-8")


def _record_len_sql(dialect: str, url: str, html: str) -> str:
    """Closed-form record length. Byte (not char) lengths on both sides:
    Spark octet_length works on string and binary; DuckDB needs
    encode() to get a BLOB first."""
    if dialect == "spark":
        ulen, plen = f"octet_length({url})", f"octet_length({html})"
    else:
        ulen = f"octet_length(encode({url}))"
        plen = f"octet_length(encode({html}))"
    return (
        f"cast({HEADER_FIXED} + {ulen}"
        f" + length(cast({plen} as string)) + {plen} as bigint)"
    )


def segment_expr(n_segments: int = N_SEGMENTS) -> str:
    """Deterministic segment assignment (portable hash — NOT url order,
    so adding pages never renumbers existing segments' neighbors)."""
    return f"cast({sql_h1('doc_id', WARC_SALT)} % {n_segments} as bigint)"


def cdx_index(pages: DataFrame, n_segments: int = N_SEGMENTS) -> DataFrame:
    """(doc_id, url, segment, rec_offset, record_len) for every page —
    the CDX index of the corpus's WARC layout, computed without touching
    a single record byte."""
    r = pages.select(
        "doc_id",
        "url",
        F.expr(segment_expr(n_segments)).alias("segment"),
        F.expr(_record_len_sql("spark", "url", "html")).alias("record_len"),
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return r.select(
        "doc_id",
        "url",
        "segment",
        (F.sum("record_len").over(w) - F.col("record_len"))
        .cast("bigint")
        .alias("rec_offset"),
        "record_len",
    )


def duck_cdx_sql(pages_sql_duck: str, n_segments: int = N_SEGMENTS) -> str:
    """DuckDB twin of cdx_index: html rebuilt inline (duck pages carry
    text only), then the identical arithmetic + running-sum window."""
    from ..sources.pages import html_expr

    return f"""
with p as (
  select doc_id, url, {html_expr('duck', 'text', 'doc_id')} as html
  from ({pages_sql_duck})
),
r as (
  select doc_id, url,
         {segment_expr(n_segments)} as segment,
         {_record_len_sql('duck', 'url', 'html')} as record_len
  from p
)
select doc_id, url, segment,
       cast(sum(record_len) over (partition by segment order by doc_id
              rows between unbounded preceding and current row)
            - record_len as bigint) as rec_offset,
       record_len
from r
"""


# ---------------------------------------------------------------------------
# byte path (build + parse) — validates the arithmetic index against
# real record bytes; see module docstring for the production caveat
# ---------------------------------------------------------------------------

_SEG_SCHEMA = "segment bigint, n_records bigint, data binary"
_PARSE_SCHEMA = (
    "segment bigint, rec_offset bigint, url string, payload_len bigint"
)


def build_segments(
    pages: DataFrame, n_segments: int = N_SEGMENTS
) -> DataFrame:
    """Materialize (segment, n_records, data) WARC blobs. Records are
    ordered by doc_id within a segment — the same order cdx_index's
    window assumes, so offsets line up by construction."""
    import pandas as pd

    sel = pages.select(
        "doc_id",
        "url",
        F.date_format("warc_ts", DATE_FMT_SPARK).alias("wdate"),
        "html",
        F.expr(segment_expr(n_segments)).alias("segment"),
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob = b"".join(
            warc_record(u, d, bytes(h))
            for u, d, h in zip(pdf["url"], pdf["wdate"], pdf["html"])
        )
        return pd.DataFrame(
            {
                "segment": [int(pdf["segment"].iloc[0])],
                "n_records": [len(pdf)],
                "data": [blob],
            }
        )

    return sel.groupBy("segment").applyInPandas(assemble, _SEG_SCHEMA)


def parse_segment_bytes(data: bytes) -> list[tuple[int, str, bytes]]:
    """Walk a segment blob record-by-record via Content-Length (the only
    correct WARC framing — payload bytes may contain anything, so no
    delimiter scan). Returns (offset, url, payload) per record."""
    out: list[tuple[int, str, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        hdr_end = data.index(b"\r\n\r\n", pos)
        head = data[pos:hdr_end].decode("utf-8")
        fields = dict(
            line.split(": ", 1) for line in head.split("\r\n")[1:]
        )
        clen = int(fields["Content-Length"])
        payload = data[hdr_end + 4 : hdr_end + 4 + clen]
        out.append((pos, fields["WARC-Target-URI"], payload))
        pos = hdr_end + 4 + clen + len(_TRAILER)
    return out


def parse_segments(segments: DataFrame) -> DataFrame:
    """mapInPandas binary parser over segment blobs -> one row per
    record (segment, rec_offset, url, payload_len). Arrow ships each
    blob once; parsing is pure Python over bytes (no regex, no JVM
    round-trips)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for seg, blob in zip(pdf["segment"], pdf["data"]):
                for off, url, payload in parse_segment_bytes(bytes(blob)):
                    rows.append((int(seg), off, url, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=["segment", "rec_offset", "url", "payload_len"],
            )

    return segments.mapInPandas(gen, _PARSE_SCHEMA)
