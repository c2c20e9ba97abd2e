from . import sugar_4dgen, sugar_static, zero123_system  # noqa: F401
