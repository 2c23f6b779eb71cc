"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in schisma_ray) calls ``ray.init``/``ray.shutdown``.

* ``entry()`` — flagship pipeline: generate the deterministic synthetic
  image+caption table at sf0.001 scale and run the full validation
  pipeline (schema + decode + uniqueness + referential); returns the
  violations Dataset.
* ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data battery); see
  schisma_ray/pipelines/catalog.py.
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
  query, column names matched to the Ray outputs.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from schisma_ray.pipelines import validate_images
    from schisma_ray.sources import image_table

    table_dir = image_table.generate_for_sf("/root/testdata/sf0.001")
    return validate_images(table_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from schisma_ray.pipelines import catalog
    from schisma_ray.sources import image_table

    # pre-generate the image tables the oracle SQL reads, so the check
    # passes regardless of whether the driver runs SQL or Ray first
    image_table.generate_for_sf("/root/testdata/sf0.001")
    image_table.generate_for_sf(catalog.ORACLE_SF_DIR)
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    from schisma_ray.pipelines import catalog

    return catalog.oracle_sql()
