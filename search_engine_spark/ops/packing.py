"""Training-sample packing: concatenate ordered texts into fixed
token-budget windows.

SFT/pre-training pipelines feed models CONTEXTS, not rows: a
conversation's turns (or a source's documents) are concatenated in
order and chunked into ~``budget``-token windows. The packing rule is
the deterministic streaming one — a row goes into window
``floor(tokens_before_it / budget)`` of its group — i.e. windows are
cut at fixed token offsets of the group's running stream, never
re-ordered. A window whose last row straddles an offset overruns the
budget by part of that row (the tokenizer stage truncates); the
trade is deliberate: bin-packing optimality is order-destroying and
non-deterministic under parallelism, while fixed offsets reproduce
bit-identically on any cluster size and in SQL.

One shuffle by group for the running-sum window; the window
aggregation groups on (group, window_idx) — a superset of the window's
partitioning key, so no second exchange. Rows longer than the budget
get a window of their own (truncation policy belongs to the tokenizer
stage, not the packer). Like any ordered-per-group operator, one
group's rows must colocate: a pathologically long conversation is one
task — pre-split such groups upstream (e.g. on day boundaries) if a
single group can exceed a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_texts(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(group, window_idx, text, n_tokens, n_rows): ``text`` is the
    window's rows joined by ``sep`` in ``order_col`` order; windows cut
    at fixed ``budget_tokens`` offsets of the group's token stream (so
    a window may overrun by part of its final row — module docstring).
    Tokens are whitespace tokens (swap in a real tokenizer's count
    column upstream if available)."""
    toks = F.size(F.split(F.col(text_col), r"\s+"))
    w = Window.partitionBy("group_id").orderBy("_ord").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = df.select(
        F.col(group_col).alias("group_id"),
        F.col(order_col).alias("_ord"),
        F.col(text_col).alias("_text"),
        toks.alias("_tok"),
    ).withColumn(
        "window_idx",
        (
            (F.sum("_tok").over(w) - F.col("_tok"))  # tokens BEFORE this row
            / F.lit(budget_tokens)
        )
        .cast("long"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("_ord"), F.col("_text")))
    )
    return (
        staged.groupBy("group_id", "window_idx")
        .agg(
            F.concat_ws(sep, F.transform(ordered, lambda s: s["_text"])).alias(
                "text"
            ),
            F.sum("_tok").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )
