from .inspect import physical_plan, assert_broadcast, assert_pushed_filters  # noqa: F401
