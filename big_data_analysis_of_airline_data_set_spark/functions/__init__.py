from .flight_exprs import (
    delay_status,
    hhmm_hour,
    hhmm_hour_int,
    hhmm_minute,
    hhmm_minute_int,
    city_from_city_state,
    delay_group,
    DELAY_GROUPS,
)

__all__ = [
    "delay_status",
    "hhmm_hour",
    "hhmm_hour_int",
    "hhmm_minute",
    "hhmm_minute_int",
    "city_from_city_state",
    "delay_group",
    "DELAY_GROUPS",
]
