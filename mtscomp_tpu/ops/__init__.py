from .delta import diff_along_axis, cumsum_along_axis  # noqa: F401
