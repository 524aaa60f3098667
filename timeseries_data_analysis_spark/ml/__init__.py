from . import dl, impute, pipeline, tracking  # noqa: F401
