"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put``; each batch does one numpy matmul and emits only its local
top-k rows, so the global merge handles ``k × num_batches`` rows instead of
the full table. Scale path: random-hyperplane LSH bucketing (probe only
matching buckets) for sub-linear candidate generation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _embedding_matrix(col) -> np.ndarray:
    """Arrow ``list<float>`` column → (n, dim) float64 matrix without a
    Python loop: flatten the list values (respects slicing/validity) and
    reshape when the widths are uniform — the embedding-column invariant.
    Falls back to the per-row path for ragged input."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if isinstance(arr.type, pa.ExtensionType):
        # Ray tensor extension (e.g. from_pandas of ndarray cells)
        return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.float64)
    lengths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    width = int(lengths[0]) if len(lengths) else 0
    if (lengths == width).all() and arr.null_count == 0:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(n, width)
    return np.asarray(
        [np.asarray(e, dtype=np.float64) for e in arr.to_pylist()]
    )


class BatchTopK:
    """Per-batch cosine top-k against a broadcast query matrix."""

    def __init__(self, query_ref, id_column: str = "vec_id",
                 column: str = "embedding", k: int = 10):
        self.query_ref = query_ref
        self.id_column = id_column
        self.column = column
        self.k = k
        self._q = None  # fetched once per actor/task on first batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._q is None:
            q = self.query_ref
            if isinstance(q, ray.ObjectRef):
                q = ray.get(q)
            self._q = _normalize(np.asarray(q, dtype=np.float64))
        emb = _embedding_matrix(batch[self.column])
        ids = np.asarray(batch[self.id_column].to_pylist())
        if emb.size == 0:
            return pa.table(
                {"query_idx": pa.array([], pa.int32()),
                 self.id_column: pa.array([], batch[self.id_column].type),
                 "cosine": pa.array([], pa.float64())}
            )
        emb = _normalize(emb)
        scores = emb @ self._q.T  # (batch, num_queries)
        k = min(self.k, scores.shape[0])
        out_q, out_id, out_cos = [], [], []
        for qi in range(scores.shape[1]):
            col = scores[:, qi]
            # tie-aware (cosine DESC, id ASC) selection: duplicated rows
            # have EXACTLY equal cosines, and argpartition at the k
            # boundary kept an arbitrary tied member — breaking both
            # block-layout determinism and the oracle's ORDER BY tie-break
            top = np.lexsort((ids, -col))[:k]
            for t in top:
                out_q.append(qi)
                out_id.append(ids[t])
                out_cos.append(float(col[t]))
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                self.id_column: pa.array(out_id, batch[self.id_column].type),
                "cosine": pa.array(out_cos, pa.float64()),
            }
        )


def brute_force_topk(ds, queries: np.ndarray, *, id_column="vec_id",
                     column="embedding", k=10, batch_size=4096):
    """Global cosine top-k per query vector. Returns a small pyarrow Table
    (query_idx, id, cosine) sorted by (query_idx, -cosine, id)."""
    query_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partial = ds.select_columns([id_column, column]).map_batches(
        BatchTopK(query_ref, id_column, column, k),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    rows = partial.take_all()  # k rows per (batch, query) — small
    import pandas as pd

    df = pd.DataFrame(rows)
    if df.empty:
        return df
    df = df.sort_values(["query_idx", "cosine", id_column],
                        ascending=[True, False, True])
    return df.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)


def sample_embedding_rows(ds, *, column: str, n: int,
                          approx_rows: int | None, seed: int) -> np.ndarray:
    """Draw ~``n`` embedding rows for driver-side quantizer training,
    positionally unbiased.

    ``random_sample`` is order-preserving per-block Bernoulli, so
    ``.limit(n)`` on its output keeps only the EARLIEST blocks — a badly
    biased sample when the input is sorted/clustered by position (e.g.
    class-contiguous corpora).  Instead we take *every* Bernoulli-sampled
    row (expected 4×n — tiny on the driver), canonically order, and
    seeded-downsample to ``n``.  Without ``approx_rows`` the frac is
    unknown; we fall back to the first ``n`` rows (documented bias).
    """
    proj = ds.select_columns([column])
    if approx_rows and approx_rows > n:
        frac = min(1.0, (n * 4) / approx_rows)
        rows = proj.random_sample(frac, seed=seed).take_all()
    else:
        rows = proj.limit(n).take_all()
    sample = np.asarray([np.asarray(r[column], dtype=np.float64)
                         for r in rows])
    if len(sample) > n:
        # canonical order first: take_all() block arrival order is not
        # deterministic, and the downsample must not depend on it
        sample = sample[np.lexsort(sample.T)]
        idx = np.random.default_rng(seed).choice(len(sample), n,
                                                 replace=False)
        sample = sample[np.sort(idx)]
    return sample


def _kmeans(sample: np.ndarray, n_cells: int, *, iters: int = 8,
            seed: int = 5) -> np.ndarray:
    """Small deterministic Lloyd's k-means on a driver-side sample (the
    coarse quantizer — IVF training is always sample-based)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    centroids = sample[rng.choice(len(sample), size=min(n_cells, len(sample)),
                                  replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IVFAssignFilter:
    """Assign each row to its nearest coarse centroid and pass through only
    rows in the query's probed cells — the IVF scan-skip expressed as a
    streaming filter. At real scale the table is *stored* partitioned by
    cell id (write_parquet partitioned on ``ivf_cell``) so unprobed cells
    are never read; here the filter documents the same pruning on a flat
    input."""

    def __init__(self, centroids_ref, probed_ref, column: str = "embedding"):
        self.centroids_ref = centroids_ref
        self.probed_ref = probed_ref
        self.column = column
        self._c = None
        self._probed = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._c is None:
            c, p = self.centroids_ref, self.probed_ref
            self._c = ray.get(c) if isinstance(c, ray.ObjectRef) else c
            self._probed = ray.get(p) if isinstance(p, ray.ObjectRef) else p
        emb = _embedding_matrix(batch[self.column])
        if emb.size == 0:
            return batch
        cells = np.argmax(_normalize(emb) @ self._c.T, axis=1)
        keep = np.isin(cells, self._probed)
        return batch.filter(pa.array(keep))


def ivf_topk(ds, queries: np.ndarray, *, id_column="vec_id",
             column="embedding", k=10, n_cells=16, nprobe=4,
             train_sample=2048, batch_size=4096, approx_rows=None):
    """IVF approximate top-k: train a coarse quantizer on a sample, probe
    the ``nprobe`` cells nearest each query, exact cosine only within the
    probed cells. Returns (query_idx, id, cosine) like ``brute_force_topk``
    (whose scan touches every row; this one's touches ~nprobe/n_cells).

    With ``approx_rows`` the quantizer trains on a seeded Bernoulli sample
    across the whole dataset; without it, on the first ``train_sample``
    rows (biased when the input is sorted/clustered by position)."""
    sample = sample_embedding_rows(ds, column=column, n=train_sample,
                                   approx_rows=approx_rows, seed=5)
    centroids = _kmeans(sample, n_cells)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.unique(
        np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe].reshape(-1)
    )
    centroids_ref = ray.put(centroids)
    probed_ref = ray.put(probed)
    filtered = ds.select_columns([id_column, column]).map_batches(
        IVFAssignFilter(centroids_ref, probed_ref, column),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return brute_force_topk(
        filtered, queries, id_column=id_column, column=column, k=k,
        batch_size=batch_size,
    )


class MultiTableHyperplaneLSH:
    """All banding tables in ONE input pass: ``num_tables`` independent
    plane sets, each batch emits that many stacked copies tagged
    (``lsh_table``, ``lsh_bucket``). One scan regardless of table count —
    the previous per-table dataset + union shape re-read the input once
    per table."""

    def __init__(self, dim: int, num_planes: int, num_tables: int,
                 column: str = "embedding", seed: int = 11):
        self.planes = [
            np.random.default_rng(seed + 101 * t).standard_normal(
                (num_planes, dim)
            )
            for t in range(num_tables)
        ]
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _embedding_matrix(batch[self.column])
        n = len(batch)
        parts = []
        for t, planes in enumerate(self.planes):
            if emb.size == 0:
                bucket = np.zeros(0, dtype=np.int64)
            else:
                bits = (emb @ planes.T) > 0
                bucket = np.zeros(len(emb), dtype=np.int64)
                for i in range(bits.shape[1]):
                    bucket |= bits[:, i].astype(np.int64) << i
            part = batch.append_column(
                "lsh_bucket", pa.array(bucket, pa.int64())
            )
            parts.append(
                part.append_column(
                    "lsh_table",
                    pa.array(np.full(n, t, dtype=np.int32)),
                )
            )
        return pa.concat_tables(parts)


def embedding_near_duplicates(ds, *, id_column="vec_id", column="embedding",
                              dim: int, threshold: float = 0.95,
                              num_planes: int | None = None,
                              num_tables: int = 2,
                              approx_rows: int | None = None,
                              bucket_cap: int = 4096,
                              batch_size: int = 4096,
                              pair_dedup_threshold: int = 2_000_000):
    """Near-duplicate pairs by cosine ≥ threshold via random-hyperplane LSH
    buckets, verified exactly within each bucket — no all-pairs pass.

    Scale levers (round 1 had fixed 8-10 planes → bucket population grew
    linearly with data and the in-bucket verify is quadratic):
      * ``num_planes`` defaults to an occupancy target (~64 expected rows
        per bucket for ``approx_rows``), so bucket population stays bounded
        as data grows;
      * ``num_tables`` independent plane sets (multi-table banding) recover
        the recall that more planes cost — a true near-dup pair collides in
        at least one table with high probability;
      * ``bucket_cap`` bounds the QUADRATIC verify group: an oversized
        bucket is re-probed with a finer, deterministically-seeded plane
        set (one extra refinement level per pass, logged — never a silent
        row drop) until its sub-buckets fit, then each sub-bucket is
        verified exactly. Pairs the refinement planes split apart within
        one table are the standard LSH recall tradeoff and are recovered
        by the other ``num_tables`` tables;
      * the verify matmul runs in row chunks, bounding the (chunk × bucket)
        similarity allocation;
      * duplicate pairs across tables/buckets are dropped by
        ``dedup_pair_dataset`` (size-adaptive exchange).

    Output contract (``id_a``, ``id_b``, ``cosine``): the pair list is the
    complete ≥-threshold set EXCEPT inside a bucket that is still oversized
    at the maximum refinement depth (a dense near-collinear clique, after
    byte-identical vectors have been exact-collapsed to min-id star pairs).
    Such a bucket takes a bounded STAR SWEEP: pivot→member pairs are
    emitted and member↔member pairs within one sweep are represented only
    through the shared pivot (logged with a warning each time). That is
    sufficient for dedup / connected-components consumers — the pivot links
    the clique — but a consumer that needs the literal exhaustive pair list
    must treat star-swept buckets as reduced-pair semantics. A clique of k
    mutually-similar rows is inherently Θ(k²) pairs; the sweep keeps output
    linear by design rather than OOMing.
    """
    import math

    import pandas as pd

    from .dedup import dedup_pair_dataset

    if num_planes is None:
        n = approx_rows or 100_000
        num_planes = max(4, min(24, math.ceil(math.log2(max(2.0, n / 64)))))

    pruned = ds.select_columns([id_column, column])
    bucketed = pruned.map_batches(
        MultiTableHyperplaneLSH(dim, num_planes, num_tables, column=column),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    import logging

    logger = logging.getLogger(__name__)
    _MAX_REFINE = 8

    def verify(group: pd.DataFrame, depth: int = 0) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "cosine": pd.Series([], dtype=float)}
        )
        if len(group) < 2:
            return empty
        group = group.sort_values(id_column)
        star = None
        if len(group) > bucket_cap:
            # exact-duplicate collapse (phash's collapse phase, applied
            # lazily to oversized buckets only): byte-identical embeddings
            # reduce to their min-id representative, each member linked via
            # a STAR pair (cosine exactly 1.0) instead of a quadratic
            # expansion — a 100k-row hot exact group emits 99,999 pairs,
            # not 5e9, and hyperplane refinement below then operates on
            # distinct vectors it can actually split.
            emb_all = np.array(group[column].tolist(), dtype=np.float64)
            eb = [r.tobytes() for r in emb_all]
            first_pos: dict = {}
            rep_pos = np.empty(len(group), dtype=np.int64)
            for i, b in enumerate(eb):
                rep_pos[i] = first_pos.setdefault(b, i)
            dup_mask = rep_pos != np.arange(len(group))
            if dup_mask.any():
                ids_all = group[id_column].to_numpy()
                rep_of_dup = rep_pos[dup_mask]
                # zero vectors match the quadratic path (cosine 0): no pair
                nz = np.linalg.norm(emb_all[rep_of_dup], axis=1) > 0
                star = pd.DataFrame(
                    {
                        "id_a": ids_all[rep_of_dup][nz],
                        "id_b": ids_all[dup_mask][nz],
                        "cosine": 1.0,
                    }
                )
                logger.warning(
                    "embedding verify: collapsed %d exact-duplicate rows "
                    "into %d representatives (star pairs, cosine=1.0)",
                    int(dup_mask.sum()), len(first_pos),
                )
                group = group.iloc[~dup_mask]
        if len(group) > bucket_cap and depth < _MAX_REFINE:
            # finer probe instead of the old silent head(bucket_cap) drop:
            # split the bucket with extra hyperplanes (seeded by the
            # bucket identity + depth, so re-runs are deterministic) and
            # verify each sub-bucket; nothing is truncated
            t = int(group["lsh_table"].iloc[0])
            bk = int(group["lsh_bucket"].iloc[0])
            extra = max(
                1,
                int(np.ceil(np.log2(len(group) / max(1, bucket_cap // 2)))),
            )
            logger.warning(
                "embedding verify: bucket (table=%d, bucket=%d) has %d rows "
                "> cap %d; re-probing with %d finer planes (depth %d)",
                t, bk, len(group), bucket_cap, extra, depth,
            )
            emb_all = np.array(group[column].tolist(), dtype=np.float64)
            rng = np.random.default_rng(
                (hash((t, bk, depth)) & 0x7FFFFFFF) + 7919
            )
            planes = rng.standard_normal((extra, emb_all.shape[1]))
            bits = (emb_all @ planes.T) > 0
            subkey = np.zeros(len(group), dtype=np.int64)
            for i in range(bits.shape[1]):
                subkey |= bits[:, i].astype(np.int64) << i
            outs = [] if star is None else [star]
            outs += [
                verify(g, depth + 1)
                for _, g in group.groupby(subkey, sort=False)
            ]
            outs = [o for o in outs if len(o)]
            return pd.concat(outs, ignore_index=True) if outs else empty
        if len(group) > bucket_cap:
            # depth exhausted on a bucket hyperplanes cannot split (after
            # exact collapse this means near-collinear DISTINCT vectors —
            # a dense clique whose full pair set is inherently quadratic).
            # Bounded fallback: star sweeps — pivot = min id, emit
            # pivot→member pairs ≥ threshold, drop pivot + members, repeat.
            # Same O(k²) dot-product compute as the full verify but O(k)
            # memory and linear output; member↔member pairs inside one
            # sweep are represented by their shared pivot (sufficient for
            # dedup/connected-components; logged, never silent).
            logger.warning(
                "embedding verify: bucket of %d rows unsplittable at max "
                "refine depth %d; emitting star-cluster pairs (pivot-based, "
                "linear output) instead of the full quadratic pair set",
                len(group), _MAX_REFINE,
            )
            ids_all = group[id_column].to_numpy()
            emb_n = _normalize(np.array(group[column].tolist(), dtype=np.float64))
            remaining = np.arange(len(ids_all))
            outs = [] if star is None else [star]
            while len(remaining) > 1:
                pivot, rest = remaining[0], remaining[1:]
                sims = emb_n[rest] @ emb_n[pivot]
                hit = sims >= threshold
                if hit.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "id_a": ids_all[pivot],
                                "id_b": ids_all[rest[hit]],
                                "cosine": sims[hit],
                            }
                        )
                    )
                remaining = rest[~hit]
            outs = [o for o in outs if len(o)]
            return pd.concat(outs, ignore_index=True) if outs else empty
        ids = group[id_column].to_numpy()
        emb = _normalize(np.array(group[column].tolist(), dtype=np.float64))
        out_i, out_j, out_c = [], [], []
        chunk = 1024  # bounds the (chunk, bucket) similarity block
        for s in range(0, len(emb), chunk):
            e = min(len(emb), s + chunk)
            sims = emb[s:e] @ emb.T
            ii, jj = np.where(sims >= threshold)
            keep = (ii + s) < jj  # global upper triangle: each pair once
            out_i.append(ii[keep] + s)
            out_j.append(jj[keep])
            out_c.append(sims[ii[keep], jj[keep]])
        I = np.concatenate(out_i) if out_i else np.array([], dtype=np.int64)
        if len(I) == 0:
            return star if star is not None and len(star) else empty
        J = np.concatenate(out_j)
        quad = pd.DataFrame(
            {"id_a": ids[I], "id_b": ids[J], "cosine": np.concatenate(out_c)}
        )
        if star is not None and len(star):
            return pd.concat([star, quad], ignore_index=True)
        return quad

    def verify_frame(df: pd.DataFrame) -> pd.DataFrame:
        # one hash-bucket task verifies MANY (table, lsh_bucket) groups —
        # a pandas subgroup loop (µs each), not one Ray call per group
        outs = [
            verify(g)
            for _, g in df.groupby(["lsh_table", "lsh_bucket"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cosine": pd.Series([], dtype=float)}
            )
        return pd.concat(outs, ignore_index=True)

    from .aggregate import bucketed_groups

    pairs = bucketed_groups(
        bucketed, ["lsh_table", "lsh_bucket"], verify_frame,
        approx_rows=approx_rows,
    )
    return dedup_pair_dataset(
        pairs, value_columns=["cosine"],
        pair_dedup_threshold=pair_dedup_threshold,
    )


# --- persisted IVF index (build once, query via partition-pruned reads) ----

def build_ivf_index(
    ds,
    index_dir: str,
    *,
    id_column: str = "vec_id",
    column: str = "embedding",
    n_cells: int = 16,
    train_sample: int = 2048,
    approx_rows: int | None = None,
    seed: int = 5,
    batch_size: int = 4096,
) -> np.ndarray:
    """Persist an IVF index: a sampled k-means coarse quantizer plus the
    dataset rewritten as hive-partitioned parquet keyed by nearest-cell id
    (two-phase-commit partitions via ``sources.partitioned_sink`` — a
    crashed build resumes, finished cells are skipped). This is what makes
    IVF an AT-SCALE index rather than an in-memory structure: query time
    touches only the probed cells' partition directories, so the read
    itself — not a post-read filter — skips ``1 − nprobe/n_cells`` of the
    data. Returns the (n_cells, dim) centroid matrix; a complete index
    directory is reused (idempotent)."""
    import json
    import os

    from ..sources.partitioned_sink import write_partitioned

    meta_path = os.path.join(index_dir, "meta.json")
    cent_path = os.path.join(index_dir, "centroids.npy")
    cells_dir = os.path.join(index_dir, "cells")
    if os.path.exists(meta_path) and os.path.exists(cent_path):
        return np.load(cent_path)
    os.makedirs(index_dir, exist_ok=True)
    sample = sample_embedding_rows(
        ds.select_columns([column]), column=column, n=train_sample,
        approx_rows=approx_rows, seed=seed,
    )
    centroids = _kmeans(sample, n_cells)
    cent_ref = ray.put(centroids)

    def assign_cell(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        emb = _embedding_matrix(batch[column])
        if emb.size == 0:
            return batch.append_column("cell", pa.array([], pa.int32()))
        cells = np.argmax(_normalize(emb) @ c.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cells))

    assigned = ds.select_columns([id_column, column]).map_batches(
        assign_cell, batch_format="pyarrow", batch_size=batch_size
    )
    write_partitioned(assigned, cells_dir, "cell")
    tmp = cent_path + ".tmp.npy"
    np.save(tmp, centroids)
    os.replace(tmp, cent_path)
    with open(meta_path + ".tmp", "w") as f:
        json.dump(
            {"n_cells": int(n_cells), "dim": int(centroids.shape[1]),
             "id_column": id_column, "column": column}, f,
        )
    os.replace(meta_path + ".tmp", meta_path)
    return centroids


def ivf_index_topk(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    batch_size: int = 4096,
):
    """Query a persisted IVF index: load the (tiny) centroid matrix, pick
    each query's ``nprobe`` nearest cells, and ``read_parquet`` ONLY those
    cells' partition directories — the scan never touches unprobed data.
    ``nprobe = n_cells`` degenerates to an exact (brute-force-equal)
    search that still exercises the index layout."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.unique(
        np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe].reshape(-1)
    )
    paths = []
    for c in probed.tolist():
        d = os.path.join(index_dir, "cells", f"cell={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    ds = rd.read_parquet(paths)
    return brute_force_topk(
        ds, queries, id_column=meta["id_column"], column=meta["column"],
        k=k, batch_size=batch_size,
    )
