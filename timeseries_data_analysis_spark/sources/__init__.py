from .readers import load_table, load_all, load_kiln_csv  # noqa: F401
from . import schemas  # noqa: F401
from . import sinks  # noqa: F401
