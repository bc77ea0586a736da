"""nerpii_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference (Clearbox-AI/nerpii:
``nerpii/named_entity_recognizer.py`` + ``nerpii/faker_generator.py``)
as a web-scale, Spark-first pipeline:

    pages (url, warc_ts, html, text, lang)
      -> S1 clean      (deterministic boilerplate strip, byte-identical text)
      -> S2 detect     (vectorized mention detection: PII + NER stand-ins)
      -> S3 extract    (sentence-window relation extraction -> triples)
      -> S4 link       (MinHash-LSH blocking + connected components)
      -> S5 materialize (+ masked-triple variant: keyed deterministic synth)

All randomness is keyed (portable LCG over row keys) so every stage is
deterministic, resumable, and oracle-checkable in plain SQL.
"""

__version__ = "0.1.0"

from .operators.clean import clean_pages  # noqa: E402
from .operators.detect import detect_mentions  # noqa: E402
from .operators.extract import (  # noqa: E402
    extract_triples,
    extract_triples_inline,
)
from .operators.link import link_entities, resolve_mentions  # noqa: E402
from .operators.mask import mask_table, mask_triples  # noqa: E402
from .operators.profile import column_profile  # noqa: E402
from .pipeline import Pipeline, PipelineConfig  # noqa: E402
from .session import get_spark  # noqa: E402

__all__ = [
    "clean_pages",
    "detect_mentions",
    "extract_triples",
    "extract_triples_inline",
    "link_entities",
    "resolve_mentions",
    "mask_table",
    "mask_triples",
    "column_profile",
    "Pipeline",
    "PipelineConfig",
    "get_spark",
]
