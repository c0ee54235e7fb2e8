from . import LVIS  # noqa: F401
