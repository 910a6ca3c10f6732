"""Connected components over a near-duplicate pair graph.

Completes the dedup story: the LSH / set-similarity stages emit verified
*pairs* (``id_a``, ``id_b``); real corpus dedup needs *clusters* — the
transitive closure of those pairs — so exactly one canonical document
survives per duplicate group (the convention everywhere is "keep the
min-id member", e.g. the dedup pipelines the reference's users run
downstream of `genson` schema checks).

Scale shape (mirrors ``stages.dedup.dedup_pair_dataset``'s size-adaptive
doctrine):

* only (int64, int64) edge rows and (node, label) rows ever cross an
  exchange — never document payload;
* the label map covers ONLY nodes that appear in a pair.  After LSH the
  pair graph is sparse (o(corpus) edges), so the map is small relative to
  the corpus; every node outside it is its own singleton cluster and
  never shuffles;
* small pair sets (the normal case after banding+verify) resolve in ONE
  driver-side vectorized pass (pointer-jumping min-label, O(E + V log V)
  with a handful of numpy sweeps) and the resulting label map is
  broadcast (``ray.put`` once, searchsorted probe per batch — no
  shuffle touches the corpus);
* pathological pair sets (dup-heavy crawls where edges are O(corpus))
  switch to distributed min-label propagation: per iteration one
  co-partitioned ``hash_join`` (labels onto edge sources) plus one
  bucketed min-combine.  Labels only ever decrease, so ``sum(label)`` is
  a strictly decreasing convergence witness — no diff join needed.
  Iterations are bounded by the component diameter; near-dup clusters
  are dense (diameter 1-3 in practice), so the loop is short.  The loop
  ``materialize()``s the (narrow) label dataset each round to truncate
  lineage — that is O(edge endpoints), not O(corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def label_components_numpy(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Min-label components of an undirected edge list, vectorized.

    Returns ``(node_ids_sorted, cluster_ids)`` where ``cluster_ids[i]`` is
    the smallest node id reachable from ``node_ids_sorted[i]``.
    """
    if len(src) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    ids = np.unique(np.concatenate([src, dst]))
    a = np.searchsorted(ids, src)
    b = np.searchsorted(ids, dst)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        old = lab.copy()
        # relax both edge directions, then pointer-jump to the fixpoint:
        # labels are indices into `ids`, and `ids` is sorted, so index
        # order == id order and the min label is the min reachable id
        np.minimum.at(lab, b, lab[a])
        np.minimum.at(lab, a, lab[b])
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    return ids, ids[lab]


def _symmetrize(pairs, id_a: str, id_b: str):
    """(a,b) → narrow (src,dst) rows in both directions."""

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a)
        b = batch.column(id_b)
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    return pairs.map_batches(both, batch_format="pyarrow")


def _propagate_distributed(pairs, id_a: str, id_b: str, max_iters: int):
    """Distributed min-label propagation over the edge-endpoint set."""
    from .aggregate import combine_partials
    from .join import hash_join

    edges = _symmetrize(pairs, id_a, id_b).materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        lab = np.minimum(df["src"].to_numpy(), df["dst"].to_numpy())
        return pd.DataFrame({"node": df["src"], "label": lab})

    # iteration 0 fused into init: label(v) = min(v, min neighbor)
    labels = combine_partials(
        edges.map_batches(init_labels, batch_format="pandas"),
        ["node"],
        {"label": "min"},
        small=False,
    ).materialize()
    prev_total = labels.sum("label")

    schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    for _ in range(max_iters):
        msgs = hash_join(
            edges,
            labels,
            on="src",
            right_on="node",
            right_values=["label"],
            left_schema=schema,
            right_schema=label_schema,
        ).map_batches(
            # pandas blocks: the union below must match `labels`' block type
            # (mixing Arrow and pandas blocks trips Ray's block batcher)
            lambda df: pd.DataFrame(
                {"node": df["dst"].to_numpy(), "label": df["label"].to_numpy()}
            ),
            batch_format="pandas",
        )
        labels = combine_partials(
            msgs.union(labels), ["node"], {"label": "min"}, small=False
        ).materialize()
        total = labels.sum("label")
        if total == prev_total:  # labels only decrease: fixpoint reached
            break
        prev_total = total
    return labels


def connected_components(
    pairs,
    nodes,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_column: str,
    driver_threshold: int = 5_000_000,
    max_iters: int = 50,
):
    """Cluster ids for every row of ``nodes`` given undirected ``pairs``.

    ``pairs`` is a Dataset with int64 columns ``id_a``/``id_b`` (near-dup
    edges); ``nodes`` is the corpus id column (one row per document).
    Returns a Dataset of ``(node_column, cluster_id)`` where
    ``cluster_id`` is the minimum id in the node's component (its own id
    for singletons).  Keep-one-per-cluster dedup is then the filter
    ``node == cluster_id``.
    """
    pairs = pairs.materialize()
    n_pairs = pairs.count()

    if n_pairs == 0:
        def identity(batch: pa.Table) -> pa.Table:
            v = batch.column(node_column)
            return pa.table({node_column: v, "cluster_id": v})

        return nodes.map_batches(identity, batch_format="pyarrow")

    if n_pairs <= driver_threshold:
        df = pairs.to_pandas()
        node_ids, roots = label_components_numpy(
            df[id_a].to_numpy(np.int64), df[id_b].to_numpy(np.int64)
        )
        ref = ray.put((node_ids, roots))

        def attach(batch: pa.Table) -> pa.Table:
            nid, rid = ray.get(ref)
            v = batch.column(node_column).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nid, v)
            pos = np.clip(pos, 0, len(nid) - 1)
            hit = nid[pos] == v if len(nid) else np.zeros(len(v), bool)
            out = np.where(hit, rid[pos] if len(nid) else 0, v)
            return pa.table(
                {node_column: batch.column(node_column),
                 "cluster_id": pa.array(out, type=pa.int64())}
            )

        return nodes.map_batches(attach, batch_format="pyarrow")

    labels = _propagate_distributed(pairs, id_a, id_b, max_iters)
    from .join import hash_join

    joined = hash_join(
        nodes,
        labels,
        on=node_column,
        right_on="node",
        right_values=["label"],
        how="left",
    )

    def finish(batch: pa.Table) -> pa.Table:
        # coalesce in Arrow: a pandas-format batch here would route the
        # nullable int64 label column through float64 (rounding ids above
        # 2^53) BEFORE this function ever saw it
        import pyarrow.compute as pc

        node = batch.column(node_column)
        lab = batch.column("label").cast(pa.int64())
        return pa.table(
            {node_column: node, "cluster_id": pc.coalesce(lab, node)}
        )

    return joined.map_batches(finish, batch_format="pyarrow")
