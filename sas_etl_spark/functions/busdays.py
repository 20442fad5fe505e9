"""Business-day arithmetic (SAS: INTCK('WEEKDAY', d1, d2) / DATDIF
with business-day conventions — the settlement/SLA counter every
finance and operations ETL carries).

``business_days_between(d1, d2)`` = the number of Monday-Friday days
in the half-open window (d1, d2] for d1 <= d2 (0 when equal; the
count of weekday BOUNDARIES stepped over, the INTCK-class convention).
Negative spans return the negated reverse count, mirroring INTCK.

Pure closed-form column arithmetic — full weeks contribute 5 each,
the partial week is resolved by a <=6-step higher-order fold over
actual calendar days — so it runs inside whole-stage codegen with no
UDF and no calendar table (holiday calendars bolt on as an as-of
anti-join against a broadcast holiday list).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _is_weekday(d: Column) -> Column:
    # Spark dayofweek: 1=Sunday ... 7=Saturday; weekdays are 2..6
    return F.dayofweek(d).between(2, 6).cast("int")


def business_days_between(d1: Column, d2: Column) -> Column:
    """Weekday count in (d1, d2]; antisymmetric for reversed spans."""

    def forward(a: Column, b: Column) -> Column:
        n = F.datediff(b, a)
        full_weeks = F.floor(n / 7)
        rem = n % 7
        # sequence(1, 0) DESCENDS rather than yielding empty — guard
        partial = F.when(
            rem > 0,
            F.aggregate(
                F.sequence(F.lit(1), rem),
                F.lit(0),
                lambda acc, i: acc
                + _is_weekday(F.date_add(a, i.cast("int"))),
            ),
        ).otherwise(F.lit(0))
        return (full_weeks * 5 + partial).cast("long")

    return (
        F.when(d2 >= d1, forward(d1, d2))
        .otherwise(-forward(d2, d1))
        .cast("long")
    )
