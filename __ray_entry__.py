"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship entity-resolution pipeline (blocking + TWED
pair scoring + transitive clustering, see cutwed_ray/pipelines/
entity_resolution.py) on the sf0.001 documents table.  ``queries()`` /
``oracle_sql()`` expose the operator catalog in
cutwed_ray/pipelines/queries.py.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from cutwed_ray.pipelines.queries import q_er_clusters_documents

    return q_er_clusters_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from cutwed_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cutwed_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
