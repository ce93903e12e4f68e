"""Write-through CDC: emit create/update/tombstone messages from table
state changes (the Spark analogue of the reference's ActiveRecord
callback hooks — /root/reference/lib/deimos/kafka_source.rb, behavior
only: emit on create/update/destroy, update only when watched attributes
changed, destroy emits a key-only tombstone).

Without row-level callbacks, Spark derives the change feed from a
snapshot diff (the same technique the reference uses for bulk-import
interception: refetch and emit). For a table format with a native change
feed (Delta CDF) the diff step is replaced by reading the feed; the emit
contract is identical.

Scale: the diff is one full-outer join on the key — shuffle-partitioned,
no driver materialization; watched-attr comparison is a codegen'd struct
inequality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    watched_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two table snapshots into a change set.

    Returns rows of the NEW payload (key cols + payload) plus `_op` ∈
    {'create','update','delete'}; deletes carry only key columns (payload
    NULL) — the tombstone contract. Updates are emitted only when a
    watched column changed (watched_cols=None → any payload column).
    """
    payload_cols = [c for c in new.columns if c not in key_cols]
    watched = list(watched_cols) if watched_cols is not None else payload_cols

    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in watched]).alias("_old_w"),
    )
    n = new.select(
        *key_cols,
        *payload_cols,
        F.struct(*[F.col(c) for c in watched]).alias("_new_w"),
    )
    cond = [n[k] == o[f"_ok_{k}"] for k in key_cols]
    joined = n.join(o, cond, "full_outer")

    new_exists = F.col(key_cols[0]).isNotNull()
    old_exists = F.col(f"_ok_{key_cols[0]}").isNotNull()
    op = (
        F.when(new_exists & ~old_exists, F.lit("create"))
        .when(~new_exists & old_exists, F.lit("delete"))
        .when(F.col("_new_w") != F.col("_old_w"), F.lit("update"))
    )
    changed = joined.withColumn("_op", op).filter(F.col("_op").isNotNull())

    out_cols = [
        F.coalesce(F.col(k), F.col(f"_ok_{k}")).alias(k) for k in key_cols
    ] + [
        F.when(F.col("_op") != "delete", F.col(c)).alias(c) for c in payload_cols
    ]
    return changed.select(*out_cols, "_op")


def emit_changes(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    producer,
    watched_cols: Sequence[str] | None = None,
    backend: str = "memory",
    **kw,
):
    """Diff + publish through the produce pipeline: creates/updates as
    payloads, deletes as tombstones (NULL payload columns make the
    producer's tombstone detection fire)."""
    changes = snapshot_diff(old, new, key_cols, watched_cols).drop("_op")
    return producer.publish(changes, backend=backend, **kw)


def delta_feed_to_ops(feed: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Delta change-feed rows (read_changes / deltastream
    readChangeFeed) → the snapshot_diff contract: `_op` ∈
    {'create','update','delete'}, deletes as key-only tombstones
    (payload NULLed), update_preimage rows dropped (the emit contract
    publishes new payloads only). Replaces the full-outer-join snapshot
    diff with the table's NATIVE feed — O(changed rows), no second
    snapshot scan, exactly-once per commit range.

    Output carries `_ord` (= `_commit_version`): the INTRA-WINDOW order
    key. A feed window spanning several commits (the normal shape after
    a crash-redelivery) can hold multiple ops for the SAME key;
    downstream keep-last compaction (the reference's
    batch_consumption.rb:121-125 "keep LAST per key" contract) must
    order by `_ord` — without it a resurrected create could win over
    its own later delete."""
    payload_cols = [
        c
        for c in feed.columns
        if c not in key_cols
        and c not in ("_change_type", "_commit_version", "_commit_timestamp")
    ]
    op = (
        F.when(F.col("_change_type") == "insert", F.lit("create"))
        .when(F.col("_change_type") == "update_postimage", F.lit("update"))
        .when(F.col("_change_type") == "delete", F.lit("delete"))
    )
    out = feed.filter(
        F.col("_change_type") != "update_preimage"
    ).withColumn("_op", op)
    for c in payload_cols:
        out = out.withColumn(
            c, F.when(F.col("_op") == "delete", F.lit(None)).otherwise(F.col(c))
        )
    return out.select(
        *key_cols,
        *payload_cols,
        "_op",
        F.col("_commit_version").cast("long").alias("_ord"),
    )


def iceberg_changelog_to_ops(
    changes: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Iceberg changelog rows (read_changelog) → the snapshot_diff
    contract. The changelog expresses an upsert as a delete+insert pair
    within one snapshot; per (key, snapshot): both sides present →
    'update' (new payload), insert only → 'create', delete only →
    'delete' (key-only tombstone). Pairing is a per-key aggregation on
    the already-small change set — no table scan.

    Output carries `_ord` (= `_change_ordinal`, the snapshot's 1-based
    position in the consumed lineage window): a multi-snapshot window
    emits one op row per (key, snapshot), and downstream keep-last
    compaction must order by `_ord` so a key's LAST op in the window
    wins (batch_consumption.rb:121-125 contract). Snapshot IDs are not
    ordered, which is why the changelog attaches the ordinal."""
    grp = [*key_cols, "_snapshot_id"]
    ord_src = (
        "_change_ordinal"
        if "_change_ordinal" in changes.columns
        else "_snapshot_id"  # hand-built feeds without ordinals
    )
    payload_cols = [
        c
        for c in changes.columns
        if c not in key_cols
        and c not in ("_change_type", "_snapshot_id", "_change_ordinal")
    ]
    agg = changes.groupBy(*grp).agg(
        F.max(F.when(F.col("_change_type") == "insert", 1).otherwise(0)).alias(
            "_has_ins"
        ),
        F.max(F.when(F.col("_change_type") == "delete", 1).otherwise(0)).alias(
            "_has_del"
        ),
        *[
            F.max_by(
                F.col(c), F.when(F.col("_change_type") == "insert", 1)
            ).alias(c)
            for c in payload_cols
        ],
        F.max(F.col(ord_src)).cast("long").alias("_ord"),
    )
    op = (
        F.when((F.col("_has_ins") == 1) & (F.col("_has_del") == 1), "update")
        .when(F.col("_has_ins") == 1, F.lit("create"))
        .otherwise(F.lit("delete"))
    )
    out = agg.withColumn("_op", op)
    for c in payload_cols:
        out = out.withColumn(
            c, F.when(F.col("_op") == "delete", F.lit(None)).otherwise(F.col(c))
        )
    return out.select(*key_cols, *payload_cols, "_op", "_ord")
