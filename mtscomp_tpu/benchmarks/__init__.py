from .harness import mtscomp_perf, run_grid, format_report  # noqa: F401
