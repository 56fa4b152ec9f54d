"""Training-data pipeline operators: deterministic sampling and
sequence packing.

These close the gap between "encoded token table" and "what a
pretraining run actually consumes": a reproducible per-source sample of
documents, and fixed-length packed token sequences (documents
concatenated in a deterministic order, split every ``seq_len`` tokens —
the standard packed-pretraining shape).

Scale notes (the 100 TB contract):

- :func:`stratified_sample` is a pure narrow filter — whole-stage
  codegen, no shuffle, pushes through any downstream scan.
- :func:`pack_sequences` is inherently a re-layout of the token stream,
  so ONE shuffle is unavoidable; everything else stays row-shaped. The
  per-document work is O(#overlapping sequences), never a per-token
  explode: a document's tokens travel as one array value, fragments are
  ``F.slice`` views, and the final assembly is a single
  ``groupBy(group, seq_id)`` whose groups are bounded by ``seq_len``
  tokens — no skew regardless of document-length distribution. The
  window cumsum that assigns stream offsets sorts within each
  ``group_cols`` value on one task, so by default (``shards="auto"``)
  each group is cut into ``ceil(group_tokens / tokens_per_shard)``
  deterministic hash shards that pack independently (Spark sorts each
  shard in parallel), trading global concatenation order for scale
  exactly like the salted encode partitioner — a hot source that holds
  half the corpus becomes ~its-share-of-the-cluster parallel sort
  tasks instead of one.

Everything is ``pyspark.sql.functions`` — zero Python in the data path —
and every derived value is re-expressible in DuckDB SQL, so both
operators carry full value-hash oracles in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textops import portable_hash60

PPM = 1_000_000


def stratified_sample(
    df: DataFrame,
    rates_ppm: dict[str, int],
    *,
    key_col: str = "doc_id",
    stratum_col: str = "source",
    default_ppm: int = 0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample.

    A row survives iff ``md5-hash60(key || salt) % 1e6 <
    rates_ppm[stratum]`` — so the sample is a pure function of the key,
    reproducible across runs/cluster sizes, and re-derivable row-for-row
    by the SQL oracle (unlike ``df.sample``, whose RNG is
    partition-layout-dependent). Changing ``salt`` draws an independent
    sample; strata missing from ``rates_ppm`` fall back to
    ``default_ppm``. This is the "keep 10% of crawl, 100% of wiki"
    mixture-weighting step of a training-data pipeline, as a narrow
    codegen filter with zero shuffle.
    """
    if rates_ppm:
        # one map literal + element_at, not a nested CASE chain: stays a
        # single O(1)-lookup expression even with thousands of strata
        pairs: list = []
        for stratum, ppm in sorted(rates_ppm.items()):
            pairs += [F.lit(stratum), F.lit(int(ppm))]
        rate = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(stratum_col)),
            F.lit(int(default_ppm)),
        )
    else:
        rate = F.lit(int(default_ppm))
    draw = F.pmod(
        portable_hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.lit(PPM),
    )
    return df.where(draw < rate)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    *,
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("source",),
    shards: int | str | None = "auto",
    tokens_per_shard: int = 64 * 1024 * 1024,
    size_col: str | None = None,
    drop_last: bool = False,
) -> DataFrame:
    """Pack variable-length token arrays into fixed-``seq_len`` sequences.

    Semantics: within each ``group_cols`` value (plus the derived
    ``pack_shard`` sub-stream, below), concatenate documents' tokens in
    ``order_col`` order into one virtual stream and split it every
    ``seq_len`` tokens. Output one row per sequence:
    ``(*group_cols[, pack_shard], seq_id, seq_tokens, doc_starts,
    n_tok)`` where ``doc_starts`` lists each document segment's offset
    inside the sequence (the cu_seqlens attention-mask metadata; a
    document continuing from the previous sequence contributes offset 0)
    and ``n_tok < seq_len`` only for the trailing partial sequence
    (dropped when ``drop_last``). Deterministic: same input ⇒ same
    sequences at any parallelism. ``order_col`` values must be unique
    within each group — the offset cumsum runs a ROWS frame ordered by
    ``order_col`` alone (mirroring the SQL oracle's ``ROWS UNBOUNDED
    PRECEDING``), so duplicate keys would make the concatenation order
    among the duplicates nondeterministic.

    Plan shape: window cumsum assigns each document its [start, end)
    offset in the stream; ``F.sequence`` enumerates only the sequences
    the document overlaps (≥1 row per document, +1 per extra boundary it
    straddles); each overlap carries an ``F.slice`` fragment; a final
    ``groupBy(group, seq_id)`` sorts the ≤ a-few fragments by offset and
    flattens. Shuffle volume = token bytes + O(1) per fragment; reducer
    state is capped at ``seq_len`` tokens per group — no hot keys.

    ``shards``: the window cumsum sorts each group's stream on ONE task,
    so an unsharded hot group (one source holding half a 100 TB corpus)
    would serialize the job. The default ``"auto"`` therefore splits
    every group into ``ceil(group_tokens / tokens_per_shard)``
    deterministic hash sub-streams that pack independently (a cheap
    pre-aggregate counts each group's tokens; the per-group count joins
    back via broadcast — #groups is small). The shard id is a pure
    function of the data (md5 of ``order_col`` mod the group's shard
    count), never of the partitioning, so outputs stay reproducible at
    any parallelism and SQL-mirrorable. At the default 64 Mi tokens per
    shard, test-scale inputs get exactly one shard per group
    (``pack_shard = 0``) and the semantics reduce to the unsharded
    layout. Pass an int to force a fixed shard count, or ``None`` to
    disable (strict single-stream concatenation; serializes per group).
    ``size_col``: name of a column already holding ``size(tokens)`` (the
    BASELINE input table carries ``n_tok``). The auto-shard pre-count
    then reads ONLY that scalar — without it, computing group totals
    re-evaluates the whole ``tokens`` expression a second time (e.g. a
    regexp tokenization upstream runs twice). Caller contract:
    ``size_col == size(tokens_col)`` row-for-row.
    """
    gcols = list(group_cols)
    n_expr = (
        F.col(size_col).cast("long") if size_col
        else F.size(F.col(tokens_col)).cast("long")
    )
    sel = [*gcols, order_col, tokens_col] + ([size_col] if size_col else [])
    d = df.select(*sel).where(n_expr > 0)
    if shards == "auto":
        totals = d.groupBy(*gcols).agg(
            F.sum(n_expr).cast("long").alias("__gtot")
        )
        t = int(tokens_per_shard)
        n_shards = F.greatest(
            F.lit(1).cast("long"),
            F.floor((F.col("__gtot") + F.lit(t - 1)) / F.lit(t)).cast("long"),
        )
        d = (
            d.join(F.broadcast(totals), gcols)
            .withColumn(
                "pack_shard",
                F.pmod(
                    portable_hash60(F.col(order_col).cast("string")), n_shards
                ).cast("int"),
            )
            .drop("__gtot")
        )
        gcols = gcols + ["pack_shard"]
    elif shards is not None:
        d = d.withColumn(
            "pack_shard",
            F.pmod(portable_hash60(F.col(order_col).cast("string")),
                   F.lit(int(shards))).cast("int"),
        )
        gcols = gcols + ["pack_shard"]
    w = (
        Window.partitionBy(*gcols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.size(F.col(tokens_col)).cast("long")
    d = (
        d.withColumn("__end", F.sum(F.size(tokens_col)).over(w).cast("long"))
        .withColumn("__start", (F.col("__end") - n).cast("long"))
    )
    L = F.lit(int(seq_len))
    d = d.withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.floor(F.col("__start") / L),
                F.floor((F.col("__end") - 1) / L),
            )
        ),
    )
    lo = F.greatest(F.col("seq_id") * L, F.col("__start"))
    hi = F.least((F.col("seq_id") + 1) * L, F.col("__end"))
    frag = F.slice(
        F.col(tokens_col),
        (lo - F.col("__start") + 1).cast("int"),
        (hi - lo).cast("int"),
    )
    # each fragment is one document segment; its position inside the
    # sequence (lo - seq_id*L) becomes a doc boundary — the cu_seqlens
    # metadata attention masking needs to not attend across documents.
    # A document continuing from the previous sequence starts at 0.
    sorted_frags = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("__o"),
                F.col("__f"),
                F.col("__p").cast("int").alias("__p"),
            )
        )
    )
    packed = (
        d.select(
            *gcols, "seq_id",
            F.col("__start").alias("__o"),
            frag.alias("__f"),
            (lo - F.col("seq_id") * L).alias("__p"),
        )
        .groupBy(*gcols, "seq_id")
        .agg(
            F.flatten(
                F.transform(sorted_frags, lambda s: s["__f"])
            ).alias("seq_tokens"),
            F.transform(sorted_frags, lambda s: s["__p"]).alias("doc_starts"),
        )
        .withColumn("n_tok", F.size("seq_tokens").cast("long"))
    )
    if drop_last:
        packed = packed.where(F.col("n_tok") == int(seq_len))
    return packed.select(*gcols, "seq_id", "seq_tokens", "doc_starts", "n_tok")
