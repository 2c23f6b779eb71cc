"""Sources: deterministic synthetic tables + codec stand-ins."""

from . import codec, image_table  # noqa: F401
