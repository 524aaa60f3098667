from . import dl, pipeline, tracking  # noqa: F401
