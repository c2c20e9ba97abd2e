from . import (  # noqa: F401
    assembly,
    assembly_zoo,
    editing,
    sugar_4dgen,
    sugar_static,
    threestudio_zoo,
    threestudio_zoo2,
    zero123_system,
)
