from . import windows, timeseries, intervals, pivot, dedup, similarity, topk  # noqa: F401
