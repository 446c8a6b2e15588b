"""Gap-based sessionization over the events stream — the batch twin
of the streaming session-window operator: events of one user separated
by more than ``gap`` belong to different sessions.

Cross-engine determinism: all time arithmetic is integer MICROSECONDS
(``timestampdiff(MICROSECOND, epoch, ts)`` on TIMESTAMP_NTZ — the
timezone-independent twin of DuckDB's ``epoch_us``; casting to seconds
would truncate sub-second gaps, and ``unix_micros`` would drag the
session timezone into an NTZ column).  Event order within a user
breaks ties on ``event_id``.  ``value`` roll-ups are summed in
integer cents so the reduction is order-independent.

Plan (100-TB posture): ONE shuffle on ``user_id`` serves both the
lag/window session assignment and the per-session roll-up (the
groupBy reuses the window's partitioning, so Catalyst plans no second
exchange).  User cardinality is huge at crawl scale, so partitions
are balanced; a single pathological bot user is the known skew case —
cap or pre-split such users upstream (the same guard the tile engine
applies to its hottest tile).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _micros(ts_col: str) -> Column:
    """Integer microseconds since epoch, timezone-independent on
    TIMESTAMP_NTZ (DuckDB ``epoch_us`` twin)."""
    return F.expr(f"timestampdiff(MICROSECOND,"
                  f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})")


def sessionize_df(events: DataFrame, gap_minutes: int = 30,
                  ts_col: str = "ts", user_col: str = "user_id",
                  id_col: str = "event_id") -> DataFrame:
    """Per-event session assignment: ``(event_id, user_id, session_seq,
    is_session_start)`` where ``session_seq`` numbers a user's sessions
    from 1 in time order and a session starts when the gap from the
    previous event exceeds ``gap_minutes``."""
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _micros(ts_col)
    prev = F.lag(us).over(w)
    new_sess = (prev.isNull() | ((us - prev) > gap_us)).cast("long")
    return (events
            .withColumn("is_session_start", new_sess)
            .withColumn("session_seq", F.sum("is_session_start").over(w))
            .select(id_col, user_col, "session_seq", "is_session_start"))


def session_stats_df(events: DataFrame, gap_minutes: int = 30,
                     ts_col: str = "ts", user_col: str = "user_id",
                     id_col: str = "event_id",
                     value_col: str = "value") -> DataFrame:
    """Per-session roll-up: ``(user_id, session_seq, n_events,
    duration_us, value_cents)`` — duration in integer microseconds,
    value summed in integer cents (exact, order-independent)."""
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _micros(ts_col)
    prev = F.lag(us).over(w)
    new_sess = (prev.isNull() | ((us - prev) > gap_us)).cast("long")
    tagged = (events
              .withColumn("_us", us)
              .withColumn("session_seq", F.sum(new_sess).over(w)))
    return (tagged.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
        F.sum(F.round(F.col(value_col) * 100).cast("long"))
         .alias("value_cents")))
