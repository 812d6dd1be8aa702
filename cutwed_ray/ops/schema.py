"""Schema migration: declared target schema, per-column safe casts with
violation counters — the "evolve the table to the new contract" operation
every production pipeline runs weekly (int widening/narrowing, float ->
integer units, timestamp -> date partitioning keys, renames).

Semantics (explicit, SQL-replayable):

* a NULL input passes through as NULL — neither a violation nor an OK
  (the contract-gate convention, cf. ``ops/contract.py``);
* a non-null value that cannot safely cast becomes NULL in the migrated
  output and counts as ONE violation for its column;
* ``n_ok`` counts non-null values that cast; ``checksum`` is an exact
  int64 sum of ``cast_value mod 1_000_003`` (non-negative) over OK rows —
  proving the cast OUTPUTS, not just the counts, while staying bounded
  (< 2**63 up to ~9e12 rows/column) and ANSI-replayable.

Scale shape: both entry points are single streaming ``map_batches``
passes; the report's per-batch partial is ONE row per declared column
(map-side combine), so the groupby shuffles O(columns x batches) tiny
rows — never the data.  ``apply_migration`` is stateless and
shuffle-free.

Cast modes:

* ``int32``    — int64 -> int32 downcast, range-checked
* ``int64_exact`` — float64 -> int64 only where the value is finite,
  integral and |v| <= 2**53 (exactly representable)
* ``date``     — timestamp[us] -> date32 (floor to civil day)
* ``string``   — identity carry (checksum = utf8 length), the rename /
  keep lane of a migration spec
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CHECKSUM_MOD = 1_000_003
_US_PER_DAY = 86_400_000_000


@dataclass(frozen=True)
class CastSpec:
    col: str
    mode: str                    # int32 | int64_exact | date | string
    out_col: str | None = None   # rename target (default: same name)

    @property
    def target(self) -> str:
        return self.out_col or self.col


def _cast_one(t: pa.Table, spec: CastSpec):
    """-> (casted pa.Array, ok bool mask, viol bool mask).  Masks are over
    all rows; nulls are in neither."""
    c = t.column(spec.col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    nn = ~np.asarray(pc.is_null(c).to_numpy(zero_copy_only=False))
    if spec.mode == "int32":
        # fill nulls BEFORE to_numpy: a null-bearing int64 column converts
        # to float64 (NaN) otherwise, losing exactness past 2**53
        x = pc.fill_null(c.cast(pa.int64()), 0).to_numpy()
        ok = nn & (x >= -(1 << 31)) & (x <= (1 << 31) - 1)
        out = pa.array(np.where(ok, x, 0).astype(np.int32),
                       pa.int32(), mask=~ok)
        vals = x
    elif spec.mode == "int64_exact":
        v = c.to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            ok = nn & np.isfinite(v) & (v == np.floor(v)) \
                 & (np.abs(v) <= 2.0 ** 53)
        x = np.where(ok, v, 0).astype(np.int64)
        out = pa.array(x, pa.int64(), mask=~ok)
        vals = x
    elif spec.mode == "date":
        us = pc.fill_null(c.cast(pa.int64()), 0).to_numpy()
        ok = nn
        days = np.floor_divide(us, _US_PER_DAY)
        out = pa.array(days.astype(np.int32), pa.date32(), mask=~ok)
        vals = days
    elif spec.mode == "string":
        ok = nn
        out = c.cast(pa.string())
        vals = pc.utf8_length(out).to_numpy(zero_copy_only=False)
        vals = np.where(ok, vals, 0).astype(np.int64)
    else:
        raise ValueError(f"unknown cast mode {spec.mode!r}")
    viol = nn & ~ok
    return out, ok, viol, vals


def apply_migration(ds, specs: list[CastSpec]):
    """Migrated Dataset in declared-spec column order; uncastable values
    are NULL (the violation rows stay — gate them with ``cast_report`` +
    a filter if the contract demands rejection)."""
    def one(t: pa.Table) -> pa.Table:
        cols = {}
        for s in specs:
            out, _, _, _ = _cast_one(t, s)
            cols[s.target] = out
        return pa.table(cols)

    return ds.map_batches(one, batch_format="pyarrow")


def cast_report(ds, specs: list[CastSpec]):
    """Per-column migration report: (column_name, n_violations, n_ok,
    checksum), all counters exact int64, one streaming pass."""
    from ray.data.aggregate import Sum

    names = [s.target for s in specs]

    def partial(t: pa.Table) -> pa.Table:
        nv, nk, ck = [], [], []
        for s in specs:
            _, ok, viol, vals = _cast_one(t, s)
            nv.append(int(viol.sum()))
            nk.append(int(ok.sum()))
            ck.append(int(np.mod(vals[ok], CHECKSUM_MOD).sum()))
        return pa.table({
            "column_name": pa.array(names, pa.string()),
            "nv": pa.array(nv, pa.int64()),
            "nk": pa.array(nk, pa.int64()),
            "ck": pa.array(ck, pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("column_name")
             .aggregate(Sum("nv", alias_name="n_violations"),
                        Sum("nk", alias_name="n_ok"),
                        Sum("ck", alias_name="checksum")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "column_name": t.column("column_name"),
            "n_violations": pa.array(
                t.column("n_violations").to_numpy().astype(np.int64),
                pa.int64()),
            "n_ok": pa.array(t.column("n_ok").to_numpy().astype(np.int64),
                             pa.int64()),
            "checksum": pa.array(
                t.column("checksum").to_numpy().astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
