from .scalar import (
    surrogate_key,
    handle_null_date,
    ticker_from_instance,
    version_tag,
    discounted_amount,
    quarter_string,
)

__all__ = [
    "surrogate_key",
    "handle_null_date",
    "ticker_from_instance",
    "version_tag",
    "discounted_amount",
    "quarter_string",
]
