"""Declarative data-quality expectations on the apply path (Delta Live
Tables "expectations" / Great-Expectations-style constraints, engine-
native).

Reference analog: tartare validates inputs before integrating them into
a coverage (invalid feeds are rejected at preprocess time) [SURVEY §2.2
P2/P3]; the CDC-engine form is per-event constraints enforced BEFORE
the merge, so a malformed upstream event can never reach table state.

Each :class:`Expectation` is a SQL boolean over the event columns; a
row passes only when the predicate is strictly TRUE (NULL counts as a
violation — constraints must be decidable). Actions:

- ``drop`` — violating rows are silently excluded from the merge (their
  counts still land in the batch metrics record);
- ``quarantine`` — violating rows are ALSO persisted (with a
  ``_violations`` name array) under ``<lake>/_quarantine/batch-<id>``
  for offline triage/repair-and-replay. The write is ``overwrite`` into
  a batch-keyed dir, so a crash-redelivered batch rewrites rather than
  duplicates;
- ``fail`` — any violation aborts the batch BEFORE anything is written
  (``ExpectationFailedError``); the table is untouched and the stream
  stops loudly.

Cost: opt-in, and only when configured — ONE aggregate per batch (per-
expectation counts and the dirty-row total in the same pass, via
array_contains sums) plus, when quarantine-action violations exist, one
small write of exactly those rows. The clean-side filter fuses into the
existing apply plan (a codegen'd predicate before the dedup shuffle),
adding no job and no exchange to the hot path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACTIONS = ("drop", "quarantine", "fail")


class ExpectationFailedError(RuntimeError):
    """A fail-action expectation was violated; the batch was aborted
    before any write."""


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: str  # SQL boolean over event columns; TRUE = row passes
    action: str = "drop"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(
                f"unknown action {self.action!r} for expectation "
                f"{self.name!r} (use one of {_ACTIONS})"
            )
        # underscore prefix is reserved for engine columns/aliases
        # (_violations, the _dirty aggregate) — a colliding user name
        # would silently read the wrong count
        if not self.name or self.name.startswith("_"):
            raise ValueError(
                f"invalid expectation name {self.name!r} (must be "
                "non-empty and not start with '_')"
            )


def tag_violations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Add a ``_violations`` array column naming every failed
    expectation (empty = row passes all). NULL predicates count as
    violations: a constraint that cannot be decided on a row has not
    been satisfied by it."""
    viol = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(e.predicate), F.lit(False)), F.lit(e.name)
                )
                for e in expectations
            ]
        )
    )
    return df.withColumn("_violations", viol)


class DeferredExpectationStats:
    """Drop-only expectation counts, collected by observe() DURING the
    batch's own write job instead of a pre-write aggregate — the counts
    are purely advisory for drop-action expectations (the rows are
    excluded by an inline codegen'd filter either way), so nothing
    needs to block before the write. ``resolve()`` is called by
    ``apply_batch`` after the batch's first full-pass action; if AQE's
    empty-relation propagation swallowed the metrics row (an all-
    filtered batch), it falls back to one explicit agg on the tagged
    lineage — the same rare-path trade as the fence detector."""

    def __init__(self, obs, tagged: DataFrame, expectations):
        self._obs = obs
        self._tagged = tagged
        self._expectations = expectations

    def _agg_exprs(self):
        return [
            F.sum((F.size("_violations") > 0).cast("long")).alias("_dirty"),
            *[
                F.sum(
                    F.array_contains("_violations", e.name).cast("long")
                ).alias(e.name)
                for e in self._expectations
            ],
        ]

    def resolve(self) -> dict:
        try:
            row = dict(self._obs.get)
        except Exception:
            row = {}
        if "_dirty" not in row:
            row = self._tagged.agg(*self._agg_exprs()).collect()[0].asDict()
        counts = {
            e.name: int(row[e.name] or 0)
            for e in self._expectations
            if row.get(e.name)
        }
        return {
            "expectations_failed": counts,
            "rows_excluded": int(row["_dirty"] or 0),
            "rows_quarantined": 0,
        }


def enforce_expectations(
    lake,
    events: DataFrame,
    expectations: list[Expectation],
    batch_id: int,
) -> tuple[DataFrame, dict | DeferredExpectationStats]:
    """Split a batch against its expectations: returns the CLEAN frame
    (violating rows removed, ``_violations`` dropped) plus a stats dict
    for the batch metrics record. Raises :class:`ExpectationFailedError`
    on any fail-action violation — before any quarantine write, so an
    aborted batch leaves no partial artifacts.

    Cost by action mix: ``fail``/``quarantine`` expectations must know
    the counts BEFORE anything is written (the abort / the quarantine
    write depend on them), so those configs pay one aggregate per
    batch. An all-``drop`` config pays ZERO extra jobs — the filter
    fuses into the apply plan and the counts ride the write job as
    observe() metrics (:class:`DeferredExpectationStats`, resolved by
    ``apply_batch`` post-write; A/B in BENCH/BASELINE.md round-5
    addenda)."""
    tagged = tag_violations(events, expectations)
    if all(e.action == "drop" for e in expectations):
        from pyspark.sql import Observation

        obs = Observation()
        deferred = DeferredExpectationStats(obs, tagged, expectations)
        observed = tagged.observe(obs, *deferred._agg_exprs())
        clean = observed.filter(F.size("_violations") == 0).drop("_violations")
        return clean, deferred
    # ONE aggregate over the batch yields both the per-expectation
    # violation counts (array_contains sums — no explode, so a row
    # violating several expectations counts once per each) and the
    # total violating-row count (no double counting).
    agg_row = tagged.agg(
        F.sum((F.size("_violations") > 0).cast("long")).alias("_dirty"),
        *[
            F.sum(
                F.array_contains("_violations", e.name).cast("long")
            ).alias(e.name)
            for e in expectations
        ],
    ).collect()[0]
    counts = {
        e.name: int(agg_row[e.name] or 0)
        for e in expectations
        if agg_row[e.name]
    }
    n_dirty = int(agg_row["_dirty"] or 0)
    failed = [
        e.name for e in expectations if e.action == "fail" and counts.get(e.name)
    ]
    if failed:
        raise ExpectationFailedError(
            f"batch {batch_id} violates fail-action expectation(s) "
            f"{failed} (counts: {({k: counts[k] for k in failed})}); "
            "nothing was written"
        )
    # Quarantine ONLY rows violating a quarantine-action expectation:
    # drop-action violations are documented as silently excluded, and
    # mixing them into the quarantine dir would poison triage tooling
    # (and overstate rows_quarantined).
    q_names = [e.name for e in expectations if e.action == "quarantine"]
    n_quarantined = 0
    if q_names and not any(counts.get(n) for n in q_names):
        # redelivery hygiene: a PREVIOUS delivery of this batch id may
        # have quarantined rows that the (repaired) redelivery no longer
        # violates — clear the stale dir so the quarantine reflects what
        # this commit actually excluded.
        import shutil

        shutil.rmtree(
            os.path.join(lake.root, "_quarantine", f"batch-{batch_id}"),
            ignore_errors=True,
        )
    if q_names and any(counts.get(n) for n in q_names):
        q_dir = os.path.join(lake.root, "_quarantine", f"batch-{batch_id}")
        to_q = tagged.filter(
            F.arrays_overlap(
                "_violations", F.array(*[F.lit(n) for n in q_names])
            )
        )
        to_q.write.mode("overwrite").parquet(q_dir)
        # count from what was actually persisted (one footer read per
        # file, no extra pass over the batch)
        import pyarrow.parquet as pq

        n_quarantined = sum(
            pq.read_metadata(os.path.join(q_dir, f)).num_rows
            for f in os.listdir(q_dir)
            if f.endswith(".parquet")
        )
    clean = tagged.filter(F.size("_violations") == 0).drop("_violations")
    stats = {
        "expectations_failed": counts,
        "rows_excluded": n_dirty,
        "rows_quarantined": n_quarantined,
    }
    return clean, stats
