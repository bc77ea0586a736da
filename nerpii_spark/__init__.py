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
