"""Runtime Bloom-filter semi-join pushdown — the join-strategy tool for
the "fact ⋉ selective dim" shape at 100 TB.

The problem: a semi join of a corpus-sized fact table against a
selective dimension still shuffles (or at least scans and feeds the
join with) EVERY fact row; when the dim side keeps only 1% of keys,
99% of the fact rows cross the exchange just to be dropped. Engines
solve this with a runtime filter (Spark's
spark.sql.optimizer.runtimeFilter.bloomFilter, Iceberg/ORC bloom
indexes): build a compact Bloom bitmap of the dim keys, push it into
the fact scan as a cheap pre-filter, and let the exact join run over
the survivors only.

This is that operator made explicit and engine-portable: the bitmap is
the repo's certified Bloom construction (dedup.bloom_build's 32-bit
packed words, frozen portable hash chain, no false negatives by
construction), probes are k chained projections + k broadcast-hash
word lookups (NO explode — the fact row count never multiplies, and a
failed probe drops the row before the next lookup), and a final exact
LEFT SEMI join removes the bounded false positives, so the result is
EXACTLY the plain semi join — certified by a plain-SQL oracle.

Scale shape: bitmap build is one map-side-combined bit_or groupBy over
the dim keys (<= BLOOM_BITS/32 = 2048 rows of reduce state, mergeable
like HLL/CMS); the fact side stays in whole-stage codegen through all
k probe-filter stages (broadcast lookups, zero exchange); only
survivors (true matches + FP rate bounded by (n_dim*k/BLOOM_BITS)^k)
reach the exact join. The win over handing Spark's own runtime filter
the job: this one replays bit-for-bit in any engine and composes with
the catalog's bucketed layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import BLOOM_BITS, BLOOM_K, _bloom_pos


def bloom_build_keys(
    dim: DataFrame, dim_key: str, k: int = BLOOM_K
) -> DataFrame:
    """-> (word int64, bits int64): Bloom bitmap of the DISTINCT bigint
    dim keys, 32 bits packed per word (the dedup.bloom_build layout and
    hash chain, applied to integer join keys instead of shingles)."""
    d = dim.select(
        F.expr(f"cast({dim_key} as bigint)").alias("bkey")
    ).distinct()
    pos = _bloom_pos("bkey", "j")
    return (
        d.select(
            "bkey", F.explode(F.expr(f"sequence(0, {k - 1})")).alias("j")
        )
        .withColumn("p", F.expr(pos))
        .select(
            F.expr("cast(p div 32 as bigint)").alias("word"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(p % 32 as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    k: int = BLOOM_K,
) -> DataFrame:
    """`fact LEFT SEMI JOIN dim` with a Bloom pre-filter on the fact
    side — identical result, far fewer rows entering the exact join.
    Probe i filters on bit h2(h1(key), i) via a broadcast word lookup;
    a row failing probe i never reaches probe i+1 (progressive
    short-circuit). No false negatives (every true match survives all
    probes by construction); false positives die in the final exact
    semi join."""
    dim_key = dim_key or fact_key
    bloom = bloom_build_keys(dim, dim_key, k)
    f = fact.withColumn("_bkey", F.expr(f"cast({fact_key} as bigint)"))
    for i in range(k):
        b = (
            bloom.withColumnRenamed("word", "_w")
            .withColumnRenamed("bits", f"_b{i}")
        )
        f = (
            f.withColumn("_p", F.expr(_bloom_pos("_bkey", str(i))))
            .withColumn("_w", F.expr("cast(_p div 32 as bigint)"))
            .withColumn(
                "_m",
                F.expr("shiftleft(cast(1 as bigint), cast(_p % 32 as int))"),
            )
            .join(F.broadcast(b), "_w", "left")
            .where(
                F.coalesce(F.col(f"_b{i}"), F.lit(0))
                .bitwiseAND(F.col("_m"))
                != 0
            )
            .drop("_p", "_w", "_m", f"_b{i}")
        )
    dim_keys = dim.select(
        F.expr(f"cast({dim_key} as bigint)").alias("_bkey")
    ).distinct()
    return f.join(dim_keys, "_bkey", "left_semi").drop("_bkey")
