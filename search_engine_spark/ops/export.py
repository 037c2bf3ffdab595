"""Training-data export: curated rows out as sharded, compressed
JSONL — the sink end of the curate -> dedup -> pack pipeline.

Trainer data loaders want many similar-sized compressed shards, not
one giant file and not a million tiny ones. Shard sizing here is
declarative: ``maxRecordsPerFile`` bounds rows per shard (the writer
rolls files without an extra shuffle), and an optional
``repartition(n)`` spreads rows when the upstream partitioning is
skewed or too narrow. Rows are written deterministically ordered
WITHIN each shard when ``order_col`` is given (``sortWithinPartitions``
— a local sort, no exchange), so re-runs produce byte-stable shards
for a fixed partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    num_partitions: int | None = None,
    order_col: str | None = None,
    compression: str = "gzip",
) -> int:
    """Write ``df`` as compressed JSONL shards under ``path``; returns
    the row count written (via the write job's own Observation — no
    read-back scan)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    out = df
    if num_partitions is not None:
        out = out.repartition(num_partitions)
    if order_col is not None:
        out = out.sortWithinPartitions(order_col)
    obs = Observation("export_rows")
    (
        out.observe(obs, F.count(F.lit(1)).alias("rows"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
        .json(path)
    )
    return int(obs.get["rows"])


def conversation_threads(turns: DataFrame) -> DataFrame:
    """Assemble transcript turns into per-conversation training samples
    (the SFT/chat-format assembly step): one row per conversation with

    * ``thread``     — turns in ``turn_idx`` order rendered as
      ``"role: text"`` lines joined by newlines (the flat chat-template
      form a tokenizer consumes),
    * ``thread_md5`` — content fingerprint of the rendered thread
      (conversation-level exact-dedup key — feed to
      :func:`..dedup.exact_duplicates`-style grouping to drop repeated
      conversations wholesale),
    * ``n_turns`` / ``n_tokens`` — length accounting for packing and
      budget decisions.

    One shuffle on ``conv_id`` (partial-agg'd collect_list, merged
    per conversation); determinism does not depend on arrival order
    because the collected (turn_idx, role, text) structs are
    ``sort_array``-ed before rendering. Conversations are bounded
    (thousands of turns, not billions), so per-group state stays
    small at any corpus scale; skew would come only from a degenerate
    single-conversation corpus.
    """
    from pyspark.sql import functions as F

    ntok = F.size(F.split(F.col("text"), r"\s+"))
    agg = (
        turns.select("conv_id", "turn_idx", "role", "text", ntok.alias("ntok"))
        .groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "role", "text"))
            ).alias("ts"),
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )
    thread = F.array_join(
        F.transform(
            F.col("ts"),
            lambda s: F.concat_ws(": ", s["role"], s["text"]),
        ),
        "\n",
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_tokens",
        thread.alias("thread"),
        F.md5(thread).alias("thread_md5"),
    )


def training_pairs(turns: DataFrame, context_turns: int = 3) -> DataFrame:
    """Extract (prompt, response) SFT training pairs from transcripts:
    one row per ASSISTANT turn that has at least one preceding turn in
    its conversation, with

    * ``prompt``   — the up-to-``context_turns`` turns immediately
      before it, rendered in turn order as ``"role: text"`` lines
      (the same chat-template form as :func:`conversation_threads`),
    * ``response`` — the assistant turn's text,
    * ``n_prompt_tokens`` / ``n_response_tokens`` — whitespace-token
      accounting of the RENDERED strings (what a tokenizer-ish budget
      would see), for packing / budget decisions downstream.

    One shuffle (the ``conv_id`` window); the frame is
    ``ROWS BETWEEN context_turns PRECEDING AND 1 PRECEDING``, so
    per-row window state is O(context_turns) regardless of
    conversation length, and ``collect_list`` over an ORDERED row
    frame is in frame (= turn) order, so the rendering is
    deterministic on any cluster size. Filtering to assistant rows
    happens AFTER the window (every turn can appear in a later turn's
    context) but before anything corpus-sized materializes — the
    output is O(assistant turns).

    Assumes ``turn_idx`` is unique per conversation (the standard
    transcript invariant — validate upstream with
    :func:`transcript_report`, whose ``n_idx_gaps`` flags violations);
    with duplicates the window frame's row order between the
    duplicates is not defined.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    ctx = F.collect_list(F.struct("role", "text")).over(w)
    prompt = F.array_join(
        F.transform(F.col("_ctx"), lambda s: F.concat_ws(": ", s["role"], s["text"])),
        "\n",
    )
    return (
        turns.select("conv_id", "turn_idx", "role", "text", ctx.alias("_ctx"))
        .where((F.col("role") == "assistant") & (F.size("_ctx") >= 1))
        .select(
            "conv_id",
            "turn_idx",
            prompt.alias("prompt"),
            F.col("text").alias("response"),
            F.size(F.split(prompt, r"\s+")).alias("n_prompt_tokens"),
            F.size(F.split(F.col("text"), r"\s+")).alias("n_response_tokens"),
        )
    )


def tool_stats(turns: DataFrame) -> DataFrame:
    """Per-tool usage analytics over agent transcripts — the
    operational summary an agent-pipeline owner reads before deciding
    what to index or train on: one row per tool name with

    * ``n_calls`` — tool-role turns invoking it,
    * ``n_convs`` — distinct conversations that used it,
    * ``avg_turn_idx`` — mean position in the conversation (early =
      routing/setup tools, late = wrap-up tools), exact integer-sum /
      count so the value is FP-identical cross-engine,
    * ``n_retries`` — calls whose IMMEDIATELY PRECEDING tool call in
      the same conversation used the same tool (consecutive same-tool
      runs — retry storms and loop bugs surface here).

    Two shuffles, both small: a ``conv_id`` window over ONLY tool-role
    turns (O(tool turns), not the corpus — the filter runs before the
    exchange), then a partial-agg'd ``groupBy(tool)`` whose output is
    tool-cardinality (dozens of rows at any corpus size).
    ``countDistinct`` is per-group exact; tool name cardinality is
    bounded, so no skew concern.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    calls = turns.where((F.col("role") == "tool") & (F.col("tool") != ""))
    # secondary sort on tool name makes retry attribution deterministic
    # even if a malformed transcript duplicates a turn_idx
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "tool")
    prev = F.lag("tool").over(w)
    return (
        calls.select(
            "conv_id",
            "turn_idx",
            "tool",
            (prev.isNotNull() & (prev == F.col("tool")))
            .cast("long")
            .alias("_retry"),
        )
        .groupBy("tool")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.round(
                F.sum("turn_idx").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_turn_idx"),
            F.sum("_retry").alias("n_retries"),
        )
    )


def transcript_report(turns: DataFrame) -> DataFrame:
    """Per-conversation structural QC for transcript ingest — the
    validation gate a training pipeline runs BEFORE indexing or SFT
    assembly: one row per conversation with

    * ``n_turns`` / ``n_empty`` — turn count and whitespace-only turns,
    * ``first_role`` — who opens the conversation (SFT loaders
      typically require ``user``),
    * ``n_role_repeats`` — adjacent same-role turn pairs (broken
      alternation; retry storms and logging bugs show up here),
    * ``n_idx_gaps`` — adjacent ``turn_idx`` deltas != 1 (dropped or
      duplicated turns),
    * ``ts_monotonic`` — event time never decreases in turn order.

    Same scale shape as :func:`conversation_threads`: ONE partial-agg'd
    shuffle on ``conv_id``; arrival-order independence via
    ``sort_array`` over (turn_idx, ...) structs; the adjacent-pair
    scans are JVM higher-order functions over the per-conversation
    array (bounded by conversation length, never corpus-sized).
    Timestamps compare as exact integer microseconds.
    """
    from pyspark.sql import functions as F

    agg = (
        turns.select(
            "conv_id",
            F.struct(
                "turn_idx",
                "role",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                F.col("text").rlike(r"^\s*$").alias("empty"),
            ).alias("t"),
        )
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list("t")).alias("ts"))
    )

    def _adjacent(pred):
        # count of adjacent (ts[i-1], ts[i]) pairs satisfying pred
        return F.size(
            F.filter(
                F.sequence(F.lit(2), F.size("ts")),
                lambda i: pred(
                    F.element_at("ts", i - 1), F.element_at("ts", i)
                ),
            )
        )

    n = F.size("ts")
    return agg.select(
        "conv_id",
        n.cast("long").alias("n_turns"),
        F.size(F.filter("ts", lambda t: t["empty"])).cast("long").alias("n_empty"),
        F.element_at("ts", 1)["role"].alias("first_role"),
        F.when(n >= 2, _adjacent(lambda a, b: a["role"] == b["role"]))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_role_repeats"),
        F.when(n >= 2, _adjacent(lambda a, b: b["turn_idx"] - a["turn_idx"] != 1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_idx_gaps"),
        F.when(n >= 2, _adjacent(lambda a, b: b["us"] < a["us"]) == 0)
        .otherwise(F.lit(True))
        .alias("ts_monotonic"),
    )
