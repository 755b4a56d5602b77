from .explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_only,
    assert_take_ordered,
    assert_whole_stage_codegen,
    count_shuffle_exchanges,
    plan_string,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "assert_read_schema_only",
    "assert_take_ordered",
    "assert_whole_stage_codegen",
    "count_shuffle_exchanges",
    "plan_string",
]
