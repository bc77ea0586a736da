"""Multimodal columns: image/audio/video as opaque `binary` payloads with
typed metadata.

The Spark-side plumbing is REAL and tested — schema, Arrow binary batch
transfer, mapInPandas signatures, partitioning — while the actual media
decoding is STUBBED (this container ships no image/audio libraries):
`decode_media` raises NotImplementedError unless PIL/soundfile are
importable, and `extract_features` computes deterministic payload-derived
features (byte length, head hash, kind-specific shape fields) so the
driver oracle can recompute them in SQL.

Table shape (derived deterministically from `documents` for tests —
`media_sql` builds it in both dialects):

    media(doc_id bigint, kind string, payload binary,
          meta struct<width int, height int, duration_ms int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import strhash, sql_strhash

KINDS = ["image", "audio", "video"]

try:  # pragma: no cover - not available in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # noqa: BLE001
    HAVE_PIL = False


def media_sql(dialect: str, doc_rel: str = "documents") -> str:
    """Deterministic fake media table: payload = utf-8 bytes of the first
    64 chars of text; kind cycles by doc_id; meta derived from doc_id."""
    payload = (
        "cast(substring(text, 1, 64) as binary)"
        if dialect == "spark"
        else "encode(substring(text, 1, 64))"
    )
    kind = (
        "element_at(array('image','audio','video'), cast(doc_id % 3 + 1 as int))"
        if dialect == "spark"
        else "list_extract(['image','audio','video'], cast(doc_id % 3 + 1 as int))"
    )
    if dialect == "spark":
        meta = (
            "named_struct('width', cast(64 + doc_id % 512 as int),"
            " 'height', cast(64 + doc_id % 256 as int),"
            " 'duration_ms', cast(1000 + doc_id % 9000 as int))"
        )
    else:
        meta = (
            "struct_pack(width := cast(64 + doc_id % 512 as int),"
            " height := cast(64 + doc_id % 256 as int),"
            " duration_ms := cast(1000 + doc_id % 9000 as int))"
        )
    return f"""
select doc_id, {kind} as kind, {payload} as payload, {meta} as meta
from {doc_rel}
"""


def decode_media(payload: bytes, kind: str):
    """Decode a media payload. STUB: the sandbox has no codec libraries;
    a real deployment swaps this for PIL / soundfile / pyav decoding.
    The Spark-side call path (Arrow binary batches into mapInPandas) is
    identical either way."""
    if kind == "image" and HAVE_PIL:  # pragma: no cover
        import io

        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(
        f"media decoding for kind={kind!r} requires codec libraries"
        " not present in this container (PIL/soundfile/pyav)"
    )


FEATURE_SCHEMA = (
    "doc_id bigint, kind string, n_bytes int, head_hash bigint,"
    " n_frames int"
)


def feature_row(doc_id: int, kind: str, payload: bytes, duration_ms: int):
    """Deterministic payload-derived features (the stand-in for decoded
    feature extraction; SQL-recomputable).

    head = first 12 CHARACTERS of the decoded payload (not 12 bytes —
    a byte slice would split multi-byte codepoints and hash a U+FFFD
    the SQL oracle can never produce; the payload is char-aligned utf-8
    by construction). n_frames = ceil(duration/40ms), exactly the row
    count frame_sample_offsets plans for the same video."""
    head = payload.decode("utf-8", errors="replace")[:12]
    n_frames = (
        -(-duration_ms // 40) if kind == "video" and duration_ms > 0 else 0
    )
    return (doc_id, kind, len(payload), strhash(head), n_frames)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas over binary payloads: the real multimodal
    plumbing (batch shape asserted in tests)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "kind", "n_bytes", "head_hash", "n_frames"]
        for pdf in batches:
            rows = [
                feature_row(d, k, p, dm)
                for d, k, p, dm in zip(
                    pdf["doc_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
                )
            ]
            yield pd.DataFrame(rows, columns=cols)

    flat = media.select(
        "doc_id", "kind", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return flat.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_offsets(media: DataFrame, every_ms: int = 40) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame offset —
    pure Catalyst (explode over a generated sequence), no decoding."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "doc_id",
            F.explode(
                # empty plan for non-positive durations (matches the
                # oracle's range(0, d, step) semantics exactly)
                F.expr(
                    "case when meta.duration_ms > 0 then"
                    f" sequence(0, meta.duration_ms - 1, {every_ms})"
                    " else array() end"
                )
            ).alias("offset_ms"),
        )
    )


def duck_features_sql(doc_rel: str = "documents") -> str:
    """DuckDB oracle for extract_features over the derived media table."""
    head = "substring(substring(text, 1, 64), 1, 12)"
    return f"""
with media as ({media_sql('duck', doc_rel)})
select m.doc_id,
       m.kind,
       cast(octet_length(m.payload) as int) as n_bytes,
       {sql_strhash(head)} as head_hash,
       cast(case when m.kind = 'video' and m.meta.duration_ms > 0
            then (m.meta.duration_ms + 39) // 40
            else 0 end as int) as n_frames
from media m join {doc_rel} d on m.doc_id = d.doc_id
"""
