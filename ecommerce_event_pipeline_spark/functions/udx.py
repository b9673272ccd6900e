"""User-defined function surface: vectorized UDAF + UDTF machinery.

The reference has no UDF of any kind (SURVEY §2.11) and this engine's
parity operators are deliberately UDF-free. This module demonstrates the
two extension points a complete engine must still offer, with the same
discipline as the rest of the package:

- a GROUPED_AGG **pandas UDAF** (Arrow-vectorized: one numpy call per
  group partition, never per row) — the escape hatch for aggregates
  Catalyst lacks;
- a Python **UDTF** (row-generating table function) — kept OUT of
  registry/bench hot paths because UDTFs are row-at-a-time Python; the
  production twin `bigrams_native` is the posexplode expression, and
  tests/test_udx.py pins that both produce identical rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _median_agg():
    # built lazily: pandas_udf resolves its DDL return type against the
    # active session, so decorating at import time would require one
    @pandas_udf("double")
    def median_agg(v: pd.Series) -> float:
        # interpolated median (mean of the two middles for even n) — the
        # same semantics as DuckDB's median()/quantile_cont(0.5), so the
        # aggregate is oracle-checkable; halving a two-double sum is exact
        return float(v.median())

    return median_agg


def value_median_by_type(events: DataFrame) -> DataFrame:
    """Per event-type interpolated median of ``value`` via the pandas
    UDAF, alongside a plain count. The grouped-agg UDF receives each
    group's column as one Arrow batch per partition-group — no Python
    per-row loop; the shuffle is the same single hash exchange a native
    aggregate uses (no partial aggregation though: grouped-agg pandas
    UDFs ship whole groups, which is the real cost vs a native
    percentile_approx at scale — use this machinery only for aggregates
    Catalyst can't express)."""
    vals = events.where(F.col("value").isNotNull())
    # Spark disallows mixing a grouped-agg pandas UDF with native
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — the count
    # comes from a second tiny aggregate joined on the group key
    medians = vals.groupBy("event_type").agg(
        _median_agg()(F.col("value")).alias("median_value")
    )
    counts = vals.groupBy("event_type").agg(F.count("*").alias("n_values"))
    return medians.join(counts, "event_type").orderBy("event_type")


def bigrams_native(docs: DataFrame, max_tokens: int = 30) -> DataFrame:
    """Production path for bigram span extraction: slice + posexplode —
    whole-stage codegen, no Python. Emits (doc_id, pos, bigram) for the
    first ``max_tokens`` tokens of each document."""
    toks = F.slice(F.split(F.lower(F.col("text")), " "), 1, max_tokens)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select("doc_id", F.posexplode(pairs).alias("pos", "bigram"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "bigram")
        .orderBy("doc_id", "pos")
    )


def make_bigram_udtf():
    """The UDTF twin of :func:`bigrams_native` — registered lazily so
    importing this module never touches the UDTF machinery on runtimes
    that lack it. Returns the udtf-wrapped class; apply with
    ``udtf_cls(lit(max_tokens), col("doc_id"), col("text"))``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class BigramUDTF:
        def eval(self, max_tokens: int, doc_id: int, text: str):
            toks = (text or "").lower().split(" ")[: int(max_tokens)]
            for i in range(len(toks) - 1):
                yield doc_id, i, toks[i] + " " + toks[i + 1]

    return BigramUDTF
