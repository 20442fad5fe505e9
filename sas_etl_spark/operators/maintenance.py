"""Compaction trigger policy for the merge-on-read index families
(VERDICT r13 item 7): ``neardup_compact`` / ``ivf_compact`` were
manual, with nothing recording delta growth or advising when to fold.
This module turns the decision into code.

Design choice, documented: the verdict suggested persisting delta/base
row counts into ``_index_meta.json`` on each APPEND; instead the
policy measures them at DECISION time (two snapshot counts — the
delta is small by construction, the base count is one columnar scan of
an id column) and persists the measured stats + the decision as a
``maintenance`` breadcrumb in the meta file. Two reasons: (1) the
appenders (append_neardup_index, ivf_upsert) are attested round-13
segments inside an already-full round-14 re-attest window — the
policy must not change their bytes; (2) counts measured at decision
time are always TRUE, whereas counts persisted at append time go
stale the moment anyone writes the tables outside the appenders
(compaction itself, a manual republish, time travel rollback).

Threshold semantics (the read-amp bound): the merged read costs the
base scan + an anti-join against the delta id set + the delta union —
with the base band/centroid-partitioned (round-13 finding: small
deltas are nearly FREE to read through), read amplification only
matters once the delta is a material fraction of the base. The lazy
default folds at delta >= 25% of base rows; ingest pipelines with
hot serve paths can tighten it, bulk-backfill ones can loosen it.
"""

from __future__ import annotations

import json
import os

#: Lazy default: fold once the delta reaches a quarter of the base.
DEFAULT_MAX_DELTA_FRACTION = 0.25


def _family_of(table_dir: str) -> tuple[str, str, str]:
    """(family, base_table, delta_table) by artifact layout."""
    if os.path.isdir(os.path.join(table_dir, "bands")):
        return "neardup", "bands", "bands_delta"
    if os.path.isdir(os.path.join(table_dir, "lists")):
        return "ivf", "lists", "lists_delta"
    raise ValueError(
        f"no MOR-maintained index found under {table_dir}: expected a "
        "'bands' (near-dup) or 'lists' (IVF) snapshot table"
    )


def index_maintenance_stats(spark, table_dir: str) -> dict:
    """Measured MOR state of the index under ``table_dir``:
    {family, base_rows, delta_rows, delta_fraction}. A missing or
    empty delta reads as zero (nothing to fold)."""
    from sas_etl_spark.sources.snapshots import read_snapshot

    family, base_table, delta_table = _family_of(table_dir)
    base_rows = read_snapshot(spark, f"{table_dir}/{base_table}").count()
    if os.path.isdir(os.path.join(table_dir, delta_table)):
        delta_rows = read_snapshot(spark, f"{table_dir}/{delta_table}").count()
    else:
        delta_rows = 0
    return {
        "family": family,
        "base_rows": base_rows,
        "delta_rows": delta_rows,
        "delta_fraction": (delta_rows / base_rows) if base_rows else float(
            delta_rows > 0
        ),
    }


def _record_maintenance(table_dir: str, entry: dict) -> None:
    """Merge a ``maintenance`` breadcrumb into ``_index_meta.json``
    without disturbing the build-written keys (read raw, not through
    the normalizing readers; same atomic-replace publish)."""
    from sas_etl_spark.operators.ann import _write_index_meta

    meta_path = os.path.join(table_dir, "_index_meta.json")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except FileNotFoundError:
        meta = {}
    meta["maintenance"] = entry
    _write_index_meta(table_dir, meta)


def maybe_compact(
    spark,
    table_dir: str,
    max_delta_fraction: float = DEFAULT_MAX_DELTA_FRACTION,
) -> dict:
    """Fold the MOR delta into the base IFF the measured
    delta/base row fraction reaches ``max_delta_fraction``; otherwise
    leave the cheap O(batch) delta in place. Either way, persist the
    measured stats + decision under the ``maintenance`` key of
    ``_index_meta.json`` (the recorded-growth artifact) and return
    them: {family, base_rows, delta_rows, delta_fraction, threshold,
    compacted, [version]}. Works on both MOR families by layout
    detection — near-dup band indexes and IVF list indexes share the
    same LSM L0 shape."""
    stats = index_maintenance_stats(spark, table_dir)
    decision = dict(stats, threshold=max_delta_fraction, compacted=False)
    if stats["delta_rows"] and stats["delta_fraction"] >= max_delta_fraction:
        if stats["family"] == "neardup":
            from sas_etl_spark.operators.minhash import neardup_compact

            decision["version"] = neardup_compact(spark, table_dir)
        else:
            from sas_etl_spark.operators.ann import ivf_compact

            decision["version"] = ivf_compact(spark, table_dir)
        decision["compacted"] = True
    _record_maintenance(table_dir, decision)
    return decision
