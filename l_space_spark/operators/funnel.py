"""Event-funnel and cohort-retention analytics over an event stream —
the two canonical product-analytics readouts, shaped for web-scale event
tables.

``funnel_steps``: strictly-ordered conversion funnel. A user has reached
step s iff they performed step s's event type STRICTLY AFTER their
earliest completion of step s−1 (the standard "ordered funnel"
semantics: min-timestamp chaining, one row per user per step). Per-step
output = users reached + e6 conversion vs step 1 and vs the previous
step.

``retention_cohorts``: classic triangle retention. Cohort = the user's
first-ever event date; for each (cohort, day-offset) cell, the count of
distinct users active that day and the e6 retention vs the cohort size.

Scale shape (100-TB contract): both are chains of combiner-backed
groupBys keyed on ``user_id`` (funnel: one filtered min-agg per step —
the per-step frames after step 1 are |users|-row, so the join chain
shrinks monotonically; retention: one first-touch agg + one distinct-day
projection + one groupBy on (cohort, offset)). No windows over the raw
event table, no per-user sort — a sessionization-style
``Window.partitionBy(user)`` would sort every user's full history;
min-aggregation doesn't. Conversion ratios divide by broadcast 1-row
aggregates. All counts BIGINT; ratios via the exact round-half-up e6
divide, so both carry exact SQL oracles.

Reference analog: none (L-space has no temporal operators); these sit
beside sessionize/asof/range-join in the engine's event-analytics
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fp_e6 as _fp_e6


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_name, users, conv_vs_first_e6, conv_vs_prev_e6),
    one row per funnel step, ordered. Strict min-timestamp chaining."""
    if not steps:
        raise ValueError("funnel_steps requires at least one step name")
    u, t, k = F.col(user_col), F.col(ts_col), F.col(type_col)
    reached = (
        events.where(k == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(t).alias("t"))
    )
    per_step = [reached]
    for name in steps[1:]:
        prev = per_step[-1].select("user", F.col("t").alias("pt"))
        nxt = (
            events.where(k == name)
            .select(u.alias("user"), t.alias("et"))
            .join(prev, "user")
            .where(F.col("et") > F.col("pt"))
            .groupBy("user")
            .agg(F.min("et").alias("t"))
        )
        per_step.append(nxt)
    rows = None
    for i, (name, df) in enumerate(zip(steps, per_step), start=1):
        c = df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            F.col("users").cast("long").alias("users"),
        )
        rows = c if rows is None else rows.unionAll(c)
    first = rows.where(F.col("step") == 1).select(
        F.col("users").alias("u1")
    )
    w_prev = rows.select(
        (F.col("step") + 1).alias("step"), F.col("users").alias("uprev")
    )
    return (
        rows.crossJoin(F.broadcast(first))
        .join(F.broadcast(w_prev), "step", "left")
        .select(
            "step", "step_name", "users",
            _fp_e6(F.col("users"), F.col("u1")).alias("conv_vs_first_e6"),
            _fp_e6(F.col("users"), F.coalesce(F.col("uprev"), F.col("users")))
            .alias("conv_vs_prev_e6"),
        )
        .orderBy("step")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day, day_offset, users, retention_e6): cohort_day = epoch
    days of the user's first event date (portable integer — no DATE
    column crosses the oracle boundary); users = distinct users of that
    cohort active at that offset; retention vs cohort size."""
    u, t = F.col(user_col), F.col(ts_col)
    day = F.datediff(F.to_date(t), F.lit("1970-01-01"))
    first = (
        events.select(u.alias("user"), day.alias("d"))
        .groupBy("user")
        .agg(F.min("d").alias("cohort_day"))
    )
    size = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    active = (
        events.select(u.alias("user"), day.alias("d"))
        .join(first, "user")
        .select("user", "cohort_day",
                (F.col("d") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
    )
    return (
        active.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("users"))
        .join(size, "cohort_day")
        .select(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            F.col("users").cast("long").alias("users"),
            _fp_e6(F.col("users"), F.col("cohort_users"))
            .alias("retention_e6"),
        )
        .orderBy("cohort_day", "day_offset")
    )
