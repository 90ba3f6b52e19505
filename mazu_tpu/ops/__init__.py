from .scan import prefix_sum  # noqa: F401
