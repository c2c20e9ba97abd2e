from . import sugar  # noqa: F401
