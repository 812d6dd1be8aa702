"""Data-contract validation: stream the corpus once, count violations of
declared per-column constraints — the schema/quality gate a production
ingestion pipeline runs before anything downstream trusts the data.

Engine-native pattern (SURVEY.md §2.6): each constraint is a vectorized
predicate ``pa.Table -> bool ndarray`` marking VIOLATING rows; every
batch reduces to one fixed-width partial row per constraint (map-side
combine), and one tiny groupby sums them — shuffle volume is
O(batches x constraints), never the corpus, and the driver sees one row
per constraint.  Predicates run inside ``map_batches`` so the scan
streams with backpressure and prunes to the referenced columns at the
read (callers pass the pruned Dataset).
"""
from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

Predicate = Callable[[pa.Table], np.ndarray]


def contract_violations(ds, checks: dict[str, Predicate]):
    """Count violations of each named constraint over the whole stream.

    Returns one row per constraint: ``(constraint_name, n_violations,
    n_checked)`` — all int64 except the name.  A predicate returning a
    wrong-length mask raises (fail fast, not silent undercount).
    """
    from ray.data.aggregate import Sum

    names = sorted(checks)

    def partial(t: pa.Table) -> pa.Table:
        viol = []
        for n in names:
            m = np.asarray(checks[n](t), dtype=bool)
            if m.shape != (len(t),):
                raise ValueError(f"constraint {n!r} returned mask of shape "
                                 f"{m.shape} for a {len(t)}-row batch")
            viol.append(int(m.sum()))
        return pa.table({
            "constraint_name": pa.array(names, pa.string()),
            "n_violations": pa.array(viol, pa.int64()),
            "n_checked": pa.array([len(t)] * len(names), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("constraint_name")
             .aggregate(Sum("n_violations", alias_name="n_violations"),
                        Sum("n_checked", alias_name="n_checked")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "constraint_name": t.column("constraint_name"),
            "n_violations": pa.array(
                t.column("n_violations").to_numpy().astype(np.int64),
                pa.int64()),
            "n_checked": pa.array(
                t.column("n_checked").to_numpy().astype(np.int64),
                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
