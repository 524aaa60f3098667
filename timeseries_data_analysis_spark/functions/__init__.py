from . import math_fns, text  # noqa: F401
