from .chcompat import (
    arg_max,
    from_unix_ts64_micro,
    to_fixed_string,
    to_start_of_minute,
    to_yyyymm,
    dec_sum,
    dec_avg,
)

__all__ = [
    "arg_max",
    "from_unix_ts64_micro",
    "to_fixed_string",
    "to_start_of_minute",
    "to_yyyymm",
    "dec_sum",
    "dec_avg",
]
