"""Transitive clustering: thresholded pair edges -> entity cluster labels.

Two implementations (SURVEY.md §2.6):

* ``union_find_driver`` — classic union-find over the edge list pulled to
  the driver.  Edges are the *thresholded* pair set, which is orders of
  magnitude smaller than the corpus (near-dup edges only); still, the
  pipeline switches to the distributed path above ``cfg.max_driver_edges``.
* ``label_propagation`` — distributed hash-to-min label propagation over
  Ray ``Dataset.join``: every node starts with label = own id; each round
  nodes take the min label over their neighborhood (both edge directions),
  plus a pointer-jumping round (label <- label[label]) so convergence is
  O(log diameter) rounds.

Cluster id = min row_id of the connected component (deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------- driver UF
class _UF:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if ra > rb:
            ra, rb = rb, ra
        self.parent[rb] = ra


def connected_components_arrays(a_ids: np.ndarray, b_ids: np.ndarray) -> dict[int, int]:
    """Vectorized connected components over an in-memory edge list.

    Hash-to-min with pointer jumping on NumPy arrays — O(log n) rounds of
    vectorized ops instead of a per-edge Python union loop (~20x faster at
    ~10^5 edges).  Returns {node: min-node-id of component}, same contract
    as ``union_find_driver``.
    """
    if a_ids.size == 0:
        return {}
    nodes, inv = np.unique(np.r_[a_ids, b_ids], return_inverse=True)
    n_e = a_ids.shape[0]
    ei, ej = inv[:n_e], inv[n_e:]
    label = np.arange(nodes.size, dtype=np.int64)
    while True:
        m = np.minimum(label[ei], label[ej])
        new = label.copy()
        np.minimum.at(new, ei, m)
        np.minimum.at(new, ej, m)
        new = new[new]                      # pointer jumping
        if np.array_equal(new, label):
            break
        label = new
    # nodes[] ascending => smallest node index == smallest node id
    return dict(zip(nodes.tolist(), nodes[label].tolist()))


def canonical_mapping(uf: _UF) -> dict[int, int]:
    """{node: cluster_id} with cluster_id = min node id of the component."""
    out: dict[int, int] = {}
    members: dict[int, list[int]] = {}
    for x in list(uf.parent.keys()):
        members.setdefault(uf.find(x), []).append(x)
    for root, ms in members.items():
        cid = min(min(ms), root)
        out[root] = cid
        for m in ms:
            out[m] = cid
    return out


def union_find_driver(edges_ds) -> dict[int, int]:
    """Collect (id_a, id_b) edge batches and union-find on the driver.

    Returns {row_id: cluster_id} for every node touched by an edge, with
    cluster_id = min row_id in the component.  Nodes without edges are
    implicitly their own cluster (mapping absent).
    """
    uf = _UF()
    for batch in edges_ds.select_columns(["id_a", "id_b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        a = batch.column("id_a").to_numpy()
        b = batch.column("id_b").to_numpy()
        for x, y in zip(a.tolist(), b.tolist()):
            uf.union(x, y)
    return canonical_mapping(uf)


def assign_clusters(ds, mapping: dict[int, int], id_col: str = "row_id"):
    """Broadcast the (small) cluster mapping and label every row.

    The mapping is broadcast ONCE as two sorted arrays and applied with a
    vectorized searchsorted per batch (a per-row dict lookup costs ~1 us/row
    of pure Python); rows not in the mapping keep their own id (singletons).
    """
    import ray

    keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    vals = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], vals[order]))

    def label(batch: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        ids = batch.column(id_col).to_numpy()
        lab = ids.astype(np.int64, copy=True)
        if k.shape[0]:
            pos = np.searchsorted(k, ids)
            pos_c = np.minimum(pos, k.shape[0] - 1)
            hit = k[pos_c] == ids
            lab[hit] = v[pos_c[hit]]
        return batch.append_column("cluster_id", pa.array(lab, pa.int64()))

    return ds.map_batches(label, batch_format="pyarrow")


def join_partitions(cap: int = 512) -> int:
    """Join/shuffle partition count sized to the cluster: each hash-join
    partition is backed by an aggregator ACTOR holding 1 CPU, so asking for
    more partitions than CPUs deadlocks small clusters (measured: a
    num_partitions=32 join never starts on a 4-CPU session).  On big
    clusters partitions track CPUs up to ``cap`` (512 keeps partition
    state per aggregator modest on a 256-node/8k-CPU cluster)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, min(cap, cpus))


def coarse_buckets(cap: int = 4096) -> int:
    """Coarse-bucket count for per-key ``map_groups`` ops (minhash/simhash/
    ngram candidate buckets, top-k-per-key, ANN merges): enough groups to
    keep every CPU busy, few enough that each group is one well-filled
    vectorized call.  Measured on this box: 64 is the sweet spot from 16 to
    32 CPUs (128 under-fills batches, 32 leaves skew); below 8 CPUs fewer,
    larger groups amortize better (2/CPU).  Scales as 2x CPUs beyond 32 so
    per-group size tracks the cluster, not the corpus (a fixed 64 would
    make each group corpus/64 rows on a 256-node cluster)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    if cpus <= 8:
        return max(2, 2 * cpus)
    return min(cap, max(64, 2 * cpus))


def assign_clusters_ds(ds, labels_ds, id_col: str = "row_id",
                       num_partitions: int | None = None):
    """Distributed cluster labeling for the at-scale path: left-outer join
    the ``label_propagation`` output onto the row Dataset (no driver
    materialization of the label table — the broadcast-dict variant
    ``assign_clusters`` is for the small-edge path only).  Rows without a
    label keep their own id (singleton clusters)."""
    import pyarrow.compute as pc

    num_partitions = num_partitions or join_partitions()
    joined = ds.join(
        labels_ds.select_columns(["node", "label"]), join_type="left_outer",
        num_partitions=num_partitions, on=(id_col,), right_on=("node",),
    )

    def finish(t: pa.Table) -> pa.Table:
        lab = pc.coalesce(pc.cast(t.column("label"), pa.int64()),
                          pc.cast(t.column(id_col), pa.int64()))
        t = t.drop_columns([c for c in ("label", "node") if c in t.column_names])
        return t.append_column("cluster_id", lab)

    return joined.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------- distributed labels
def label_propagation(edges_ds, num_partitions: int | None = None, max_rounds: int = 12):
    """Distributed connected components over the edge Dataset.

    Returns a Dataset (node uint64, label uint64) covering every node that
    appears in an edge.  Implements hash-to-min: each round a node's label
    becomes the min of its own label and its neighbors' labels, followed by
    pointer jumping.  Deterministic; rounds bounded by max_rounds with an
    early-exit convergence check on sum(labels).
    """
    import pyarrow.compute as pc

    num_partitions = num_partitions or join_partitions()

    def to_directed(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy()
        b = batch.column("id_b").to_numpy()
        return pa.table({
            "src": pa.array(np.r_[a, b], pa.int64()),
            "dst": pa.array(np.r_[b, a], pa.int64()),
        })

    directed = edges_ds.select_columns(["id_a", "id_b"]).map_batches(
        to_directed, batch_format="pyarrow"
    ).materialize()

    from ray.data.aggregate import Min

    labels = (
        directed.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
        .map_batches(
            lambda t: pa.table({
                "node": t.column("src"),
                "label": pc.min_element_wise(t.column("src"), t.column("nbr_min")),
            }),
            batch_format="pyarrow",
        )
        .materialize()
    )

    prev_sum = None
    for _ in range(max_rounds):
        # neighbor-min round: send my label to each neighbor, take min
        msgs = directed.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        ).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        combined = msgs.union(labels.select_columns(["node", "label"]))
        labels = combined.groupby("node").aggregate(Min("label", alias_name="label"))

        # pointer jumping: label <- label(label)
        lab2 = labels.map_batches(
            lambda t: pa.table({"node2": t.column("node"), "label2": t.column("label")}),
            batch_format="pyarrow",
        )
        labels = labels.join(
            lab2, join_type="left_outer", num_partitions=num_partitions,
            on=("label",), right_on=("node2",),
        ).map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "label": pc.coalesce(
                    pc.min_element_wise(t.column("label"), t.column("label2")),
                    t.column("label"),
                ),
            }),
            batch_format="pyarrow",
        ).materialize()

        s = labels.sum("label")
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    return labels
