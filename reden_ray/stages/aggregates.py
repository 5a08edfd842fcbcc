"""Skew-proof aggregation helpers.

A bare ``groupby(key).count()`` ships EVERY row through the exchange,
and a hot key (one predicate dominating billions of triples) lands on a
single reducer.  The fixes, per the north-rule's explicit-skew-handling
requirement:

- ``partial_groupby_count``: count inside each batch first (one output
  row per distinct key per batch), then a tiny global sum — the hot
  key's traffic shrinks from row-count to batch-count before the
  shuffle ever happens.  This is the mergeable-sketch shape with exact
  counters.
- ``salted_groupby_count``: for adversarial cases where even per-batch
  partials overload one reducer (astronomically many batches), salt the
  key with ``hash(row) % S`` sub-keys, aggregate, then unsalt in a
  second, tiny pass.  Included mostly as the documented pattern — the
  partial variant already bounds reducer load for counting.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum


def partial_groupby_count(ds: rd.Dataset, keys: list[str], alias: str = "n") -> rd.Dataset:
    """Exact groupby-count with per-batch pre-aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(keys).aggregate([(keys[0], "count")])
        return agg.rename_columns(keys + [alias])  # keys first, then count

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(Sum(alias, alias_name=alias))


def salted_groupby_count(
    ds: rd.Dataset, keys: list[str], n_salts: int = 16, alias: str = "n"
) -> rd.Dataset:
    """Two-phase salted count: key+salt aggregate, then unsalt."""
    import numpy as np

    def add_salt(batch: pa.Table) -> pa.Table:
        salts = np.arange(batch.num_rows, dtype=np.int64) % n_salts
        return batch.append_column("__salt", pa.array(salts))

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(keys + ["__salt"]).aggregate([(keys[0], "count")])
        return agg.rename_columns(keys + ["__salt", alias])  # keys, salt, count

    salted = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby(keys + ["__salt"])
        .aggregate(Sum(alias, alias_name=alias))
    )
    return salted.groupby(keys).aggregate(Sum(alias, alias_name=alias))
