"""Column-expression library preserving the reference's exact semantics.

Every function returns a ``Column`` built only from JVM-side built-ins
(``pyspark.sql.functions``) — zero Python UDFs, so all expressions stay
inside WholeStageCodegen (SURVEY.md §2.10: the reference also has zero
UDFs; we keep that discipline).

Quirk semantics preserved (SURVEY.md §2.12, test targets):

1. Label rule — ``Delay_Status = 0`` iff ``DepDelay <= 0 AND
   ArrDelay <= 0``, else 1 (Scripts/1_cs_777_cleaning_data.py:68).
   Note nulls fall to the ``otherwise(1)`` branch.
2. hhmm hour extraction (Scripts/1_cs_777_cleaning_data.py:79-87):
   string-based — t >= 1000 → first TWO chars of str(int(t));
   100 <= t < 1000 → first ONE char; else (including NULL, 0, <100,
   and 2400→'24' via the >=1000 branch) literal 0. Minutes are the
   LAST TWO chars of str(int(t)) — unpadded, so t=5.0 → minute 5,
   and t=NULL → NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType


def delay_status(dep_delay: Column, arr_delay: Column) -> Column:
    """0 iff both delays <= 0, else 1 ("on-time" requires both legs).

    Reference: Scripts/1_cs_777_cleaning_data.py:68. Null delays land in
    the otherwise-branch (=> 1), matching Spark's ternary null logic there.
    """
    return F.when((dep_delay <= 0) & (arr_delay <= 0), F.lit(0)).otherwise(F.lit(1))


def _hhmm_str(t: Column) -> Column:
    return t.cast(IntegerType()).cast(StringType())


def hhmm_hour(t: Column) -> Column:
    """Hour digits of an hhmm-encoded double, reference string semantics.

    Reference: Scripts/1_cs_777_cleaning_data.py:79-81 —
    ``substr(0,2)`` / ``substr(0,1)`` (Spark treats start 0 as 1) on the
    int→string cast, literal 0 otherwise. 2400.0 → 24; 959.0 → 9;
    5.0 → 0; NULL → 0 (otherwise-branch).
    """
    s = _hhmm_str(t)
    return (
        F.when(t >= 1000, s.substr(0, 2))
        .when((t >= 100) & (t < 1000), s.substr(0, 1))
        .otherwise(F.lit(0))
    )


def hhmm_minute(t: Column) -> Column:
    """Minute digits: last two chars of str(int(t)), unpadded.

    Reference: Scripts/1_cs_777_cleaning_data.py:82 — ``substr(-2,2)``.
    t=5.0 → '5'; t=2359.0 → '59'; NULL propagates as NULL.
    """
    return _hhmm_str(t).substr(-2, 2)


def hhmm_hour_int(t: Column) -> Column:
    """hhmm_hour cast to int (Scripts/1_cs_777_cleaning_data.py:89-92)."""
    return hhmm_hour(t).cast(IntegerType())


def hhmm_minute_int(t: Column) -> Column:
    """hhmm_minute cast to int (Scripts/1_cs_777_cleaning_data.py:89-92)."""
    return hhmm_minute(t).cast(IntegerType())


def city_from_city_state(city_state: Column) -> Column:
    """Strip ``", ST"`` from a ``"City, ST"`` string.

    Reference: ``split(col, ',').getItem(0)``
    (Scripts/1_cs_777_cleaning_data.py:75-76). Equivalent to
    ``substring_index(c, ',', 1)`` which avoids materializing the array;
    we keep the split form for exact parity on no-comma and empty inputs.
    """
    return F.split(city_state, ",").getItem(0)


# Delay-group buckets consumed by the reference's second visualization
# notebook (categories observed in `Scripts/CS 777 Project Visualizations
# 2.ipynb` cell 2). The producing query is absent from the reference repo
# (SURVEY.md §7.4.1), so THIS repo defines the canonical bin edges, frozen
# here and in the matching oracle SQL:
#   Cancelled              — Cancelled flights (delay is NULL there)
#   Before_Time            — arr_delay <  0
#   On_Time                — arr_delay == 0
#   Small_delay            — 0  < arr_delay <= 15
#   Medium_Delay           — 15 < arr_delay <= 60
#   Large_Delay            — arr_delay > 60
DELAY_GROUPS = (
    "Before_Time",
    "On_Time",
    "Small_delay",
    "Medium_Delay",
    "Large_Delay",
    "Cancelled",
)


def delay_group(arr_delay: Column, cancelled: Column) -> Column:
    """Bucketize arrival delay into the six viz-notebook categories."""
    return (
        F.when(cancelled, F.lit("Cancelled"))
        .when(arr_delay < 0, F.lit("Before_Time"))
        .when(arr_delay == 0, F.lit("On_Time"))
        .when(arr_delay <= 15, F.lit("Small_delay"))
        .when(arr_delay <= 60, F.lit("Medium_Delay"))
        .when(arr_delay > 60, F.lit("Large_Delay"))
        .otherwise(F.lit(None).cast(StringType()))
    )
