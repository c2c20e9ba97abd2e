from . import sugar_4dgen, sugar_static  # noqa: F401
