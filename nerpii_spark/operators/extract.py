"""S3 — relation extraction: mentions -> (subj, pred, obj) triples.

Sentence-window pattern grammar (north_rule "dependency-pattern relation
extraction"), implemented with ONE shuffle: group mentions by
(doc, sentence), then build all rule-matching pairs JVM-side with
higher-order array functions (filter/transform/flatten) — no Python in
the hot path, no per-rule re-join.

Rules (subject entity, marker flag, object entity, predicate):
  PERSON  --" works at "--> ORGANIZATION  => works_at
  ORG     --" in "-------> LOCATION       => located_in
  PERSON  --" lives at "-> LOCATION       => lives_in
  PERSON  ---------------> EMAIL_ADDRESS  => has_email   (same sentence)
  PERSON  ---------------> PHONE_NUMBER   => has_phone   (same sentence)

Subject must precede object in the sentence (subj.end < obj.begin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES = [
    # (subj_type, marker_col or None, obj_type, predicate)
    ("PERSON", "m_works", "ORGANIZATION", "works_at"),
    ("ORGANIZATION", "m_in", "LOCATION", "located_in"),
    ("PERSON", "m_lives", "LOCATION", "lives_in"),
    ("PERSON", None, "EMAIL_ADDRESS", "has_email"),
    ("PERSON", None, "PHONE_NUMBER", "has_phone"),
]


def _pairs_expr(subj_type: str, marker: str | None, obj_type: str, pred: str) -> str:
    guard = f"{marker}" if marker else "true"
    return f"""
    if({guard},
      flatten(transform(
        filter(ms, a -> a.entity_type = '{subj_type}'),
        a -> transform(
          filter(ms, b -> b.entity_type = '{obj_type}' and a.end < b.begin),
          b -> named_struct('subj', a.mention, 'pred', '{pred}',
                            'obj', b.mention, 'score',
                            a.score * b.score)))),
      cast(array() as array<struct<subj:string,pred:string,obj:string,score:double>>))
    """


def extract_triples(
    mentions: DataFrame, id_cols: tuple[str, ...] = ("doc_id", "url", "lang")
) -> DataFrame:
    """mentions -> triples(id cols..., subj, pred, obj, score)."""
    id_cols = [c for c in id_cols if c in mentions.columns]
    grouped = (
        mentions.groupBy(*id_cols, "sid")
        .agg(
            F.collect_list(
                F.struct("entity_type", "mention", "begin", "end", "score")
            ).alias("ms"),
            F.max("m_works").alias("m_works"),
            F.max("m_lives").alias("m_lives"),
            F.max("m_in").alias("m_in"),
        )
    )
    all_pairs = F.concat(*[F.expr(_pairs_expr(*r)) for r in RULES]).alias("pairs")
    return (
        grouped.select(*id_cols, all_pairs)
        .select(*id_cols, F.explode("pairs").alias("t"))
        .select(*id_cols, "t.subj", "t.pred", "t.obj", "t.score")
    )


def triples_by_pred_salted(triples: DataFrame, n_salt: int = 16) -> DataFrame:
    """Skew-aware predicate histogram (north_rule: explicit salting on hot
    predicates). `pred` is Zipf-hot (works_at dominates), so a plain
    groupBy('pred') funnels the hot key through one reducer; salt with a
    subj-hash shard, partial-agg, then final-agg on the tiny salted result.
    """
    salted = triples.withColumn(
        "salt", F.pmod(F.xxhash64("subj"), F.lit(n_salt)).cast("int")
    )
    partial = salted.groupBy("pred", "salt").agg(F.count("*").alias("c"))
    return partial.groupBy("pred").agg(F.sum("c").alias("n_triples"))
