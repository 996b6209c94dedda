from .explain import (
    assert_no_cartesian,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "assert_no_cartesian",
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
]
