"""Trainers — importing this package registers all of them
(mirrors the side-effect imports in reference ``train.py:31-46``)."""

from . import base_learner  # noqa: F401
from . import zsclip  # noqa: F401

# Registered incrementally as they land; keep imports guarded so a broken
# module never blocks the registry for the rest.
for _mod in ("coop", "cocoop", "kgcoop", "maple", "proda", "prograd",
             "promptsrc", "vpt", "taskres", "clip_adapter"):
    try:
        __import__(f"{__name__}.{_mod}")
    except ImportError:
        pass

from .calibration import tempscaling  # noqa: F401
from .calibration import parameterized_tempscaling  # noqa: F401
