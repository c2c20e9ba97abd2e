from . import sugar_static  # noqa: F401
