"""End-to-end pipelines."""

from .validate_pipeline import (  # noqa: F401
    conform_images,
    image_table_schema,
    read_images,
    validate_images,
)
