"""dreammesh4d_tpu — TPU-native video-to-4D generation framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of
WU-CVGL/DreamMesh4D (threestudio plugin).  The registry below mirrors the
behavioural contract of the reference registry (threestudio/__init__.py:1-32):
components self-register under a string name, `find` resolves a name to a
class, and the mixin syntax ``"main:sub1,sub2"`` composes classes dynamically.
"""

__version__ = "0.1.0"

__modules__: dict = {}


def register(name: str):
    """Class decorator registering a component under ``name``.

    Mirrors the reference ``threestudio.register`` (threestudio/__init__.py:18-24):
    duplicate registration of the same name raises.
    """

    def decorator(cls):
        if name in __modules__ and __modules__[name] is not cls:
            raise ValueError(f"Module {name} already registered as {__modules__[name]!r}")
        __modules__[name] = cls
        cls.__registered_name__ = name
        return cls

    return decorator


def find(name: str):
    """Resolve a registered name to its class.

    Supports the reference's dynamic mixin composition syntax
    ``"main:sub1,sub2"`` (threestudio/__init__.py:25-32): the result is a new
    type inheriting from (main, sub1, sub2).
    """
    if ":" in name:
        main_name, mixin_names = name.split(":")
        mixins = [m.strip() for m in mixin_names.split(",") if m.strip()]
        bases = [find(main_name)] + [find(m) for m in mixins]
        return type(f"{bases[0].__name__}With{'And'.join(b.__name__ for b in bases[1:])}", tuple(bases), {})
    if name not in __modules__:
        # Import built-in component packages lazily so `find` works without
        # the user importing every submodule (reference relies on the launcher
        # importing everything, launch.py:70-101).
        _import_builtin_modules()
    if name not in __modules__:
        raise KeyError(f"No registered module named {name!r}. Known: {sorted(__modules__)}")
    return __modules__[name]


_BUILTINS_IMPORTED = False


def _import_builtin_modules():
    global _BUILTINS_IMPORTED
    if _BUILTINS_IMPORTED:
        return
    _BUILTINS_IMPORTED = True
    # Import for registration side effects.
    from . import data as _data  # noqa: F401
    from .models import background as _background  # noqa: F401
    from .models import materials as _materials  # noqa: F401
    from .models import geometry as _geometry  # noqa: F401
    from .models import renderers as _renderers  # noqa: F401
    from .models import guidance as _guidance  # noqa: F401
    from .models import exporters as _exporters  # noqa: F401
    from .models import prompt_processors as _pp  # noqa: F401
    from .models import registry_names as _names  # noqa: F401
    from . import systems as _systems  # noqa: F401


import logging as _logging

logger = _logging.getLogger("dreammesh4d_tpu")


def info(msg: str, *a):
    logger.info(msg, *a)


def warn(msg: str, *a):
    logger.warning(msg, *a)


def debug(msg: str, *a):
    logger.debug(msg, *a)
