"""Product quantization (PQ) for embedding columns — the compression path
trillion-row ANN actually ships (Jégou, Douze & Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011): split each D-dim
vector into M subvectors, vector-quantize each against its own
``2^nbits``-entry codebook, and store M uint8 codes — M bytes per vector
at nbits=8 (64-d float32 → 8 B = 32×; 768-d → 96 B with M=96). Search is
Asymmetric Distance Computation (ADC): per query ONE (M, 256) lookup
table of subspace squared distances, then every candidate costs M table
gathers + a sum — no float reconstruction in the scan loop.

Scale shape (the IVF-PQ layout at 10^12 rows):

* **train** — per-subspace Lloyd's on a bounded unbiased sample,
  driver-side (the quantizer-training convention shared with
  ``cluster.kmeans_fit`` / ``similarity._kmeans``); O(sample × D) once;
* **encode** — one streaming ``map_batches`` pass; the code column is
  ``fixed_size_binary(M)``, ~200–400× smaller than the float column, so
  the SEARCHABLE representation of 10^12 vectors fits a cluster's
  aggregate object store while the float originals stay in cold storage;
* **search** — codebooks + per-query LUTs broadcast once via ``ray.put``;
  per-batch vectorized gather-sum over the code matrix, per-batch top-k
  partials, tiny driver merge (the ``q_top_events`` shape). The
  full-precision column is never re-read.
* compose with :func:`similarity.build_ivf_index` for cell-level
  scan-skip — IVF for the coarse prune, PQ codes inside each cell.

Reference N/A — the reference engine has no vector search; the public
formulation above is the design source.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import _embedding_matrix, sample_embedding_rows


def _kmeans_euclid(x: np.ndarray, k: int, *, iters: int, seed: int,
                   ) -> np.ndarray:
    """Deterministic EUCLIDEAN Lloyd's on a driver-side sample (PQ
    codebooks quantize raw subvectors — unlike the spherical
    ``similarity._kmeans``, no normalization anywhere). ``x`` must be in
    canonical (lexsorted) order so results don't depend on block arrival.
    Empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    centroids = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        # argmin ||x - c||² via the expanded form; x² is constant per row
        d = (
            -2.0 * (x @ centroids.T)
            + (centroids**2).sum(axis=1)[None, :]
        )
        assign = np.argmin(d, axis=1)
        order = np.argsort(assign, kind="stable")
        sa = assign[order]
        uniq, starts = np.unique(sa, return_index=True)
        sums = np.add.reduceat(x[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(sa)))
        centroids[uniq] = sums / counts[:, None]
    return centroids


def pq_train(
    ds,
    *,
    column: str = "embedding",
    dim: int,
    m: int = 8,
    nbits: int = 8,
    train_sample: int = 65536,
    approx_rows: int | None = None,
    iters: int = 12,
    seed: int = 7,
) -> np.ndarray:
    """Train the (m, 2^nbits, dim//m) PQ codebooks on a bounded unbiased
    sample. ``dim`` must divide evenly into ``m`` subspaces. When
    ``approx_rows`` is omitted it is derived via ``ds.count()`` so the
    Bernoulli draw never falls back to the biased positional head (the
    ``kmeans_fit`` convention)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    if nbits > 8:
        raise ValueError("codes are uint8 — nbits must be ≤ 8")
    if approx_rows is None:
        approx_rows = ds.count()
    sample = sample_embedding_rows(ds, column=column, n=train_sample,
                                   approx_rows=approx_rows, seed=seed)
    x = np.asarray(sample, dtype=np.float64)
    # canonical order: block arrival must not leak into the seeding draw
    x = x[np.lexsort(x.T)]
    k = 1 << nbits
    dsub = dim // m
    codebooks = np.zeros((m, min(k, len(x)), dsub))
    for j in range(m):
        codebooks[j] = _kmeans_euclid(
            x[:, j * dsub:(j + 1) * dsub], k, iters=iters, seed=seed + j
        )
    return codebooks


class _PQEncoder:
    """map_batches actor/task: embedding → ``fixed_size_binary(m)`` code.
    Codebook state is pulled from the object store once per worker."""

    def __init__(self, codebooks_ref, id_column: str, column: str):
        self.codebooks_ref = codebooks_ref
        self.id_column = id_column
        self.column = column
        self._cb = None
        self._cb_sq = None

    def _setup(self):
        import ray

        cb = self.codebooks_ref
        self._cb = ray.get(cb) if not isinstance(cb, np.ndarray) else cb
        self._cb_sq = [(c**2).sum(axis=1) for c in self._cb]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._cb is None:
            self._setup()
        emb = _embedding_matrix(batch[self.column])
        n = len(batch)
        m = len(self._cb)
        codes = np.zeros((n, m), dtype=np.uint8)
        if n:
            dsub = self._cb[0].shape[1]
            for j in range(m):
                sub = emb[:, j * dsub:(j + 1) * dsub]
                d = -2.0 * (sub @ self._cb[j].T) + self._cb_sq[j][None, :]
                codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
        # zero-loop fixed_size_binary build straight from the code buffer
        code_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({
            self.id_column: batch[self.id_column],
            "pq_code": code_arr,
        })


def pq_encode(ds, codebooks: np.ndarray, *, id_column: str = "vec_id",
              column: str = "embedding", batch_size: int = 4096):
    """Encode every row to its M-byte PQ code — one streaming pass."""
    import ray

    ref = ray.put(np.ascontiguousarray(codebooks, dtype=np.float64))
    return ds.select_columns([id_column, column]).map_batches(
        _PQEncoder(ref, id_column, column),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def _codes_matrix(col: "pa.ChunkedArray", m: int) -> np.ndarray:
    """fixed_size_binary(m) column → (n, m) uint8 matrix, zero Python
    loop (one buffer concat + reshape)."""
    parts = []
    for chunk in col.chunks if hasattr(col, "chunks") else [col]:
        buf = chunk.buffers()[1]
        off = chunk.offset * m
        parts.append(
            np.frombuffer(buf, dtype=np.uint8,
                          count=len(chunk) * m, offset=off)
        )
    if not parts:
        return np.zeros((0, m), dtype=np.uint8)
    return np.concatenate(parts).reshape(-1, m)



def _topk_tie_aware(dist: np.ndarray, ids: np.ndarray, k: int):
    """Batch-local top-k by (dist, id) — lexsort, not argpartition: tied
    distances (vectors sharing a code are EXACTLY tied under ADC) must
    keep the smallest ids so results are block-layout deterministic."""
    kk = min(k, len(dist))
    if not kk:
        return np.zeros(0, dtype=np.int64)
    return np.lexsort((ids, dist))[:kk]


def _merge_topk(parts: pd.DataFrame, id_column: str, k: int) -> pd.DataFrame:
    """Driver-side merge of per-batch top-k partials → (query_id, id,
    adc_dist, rank) with deterministic (adc_dist, id) tie-breaks; typed
    empty frame when nothing matched."""
    if parts.empty:
        return pd.DataFrame({
            "query_id": pd.Series([], dtype=np.int64),
            id_column: pd.Series([], dtype=np.int64),
            "adc_dist": pd.Series([], dtype=np.float64),
            "rank": pd.Series([], dtype=np.int64),
        })
    parts = parts.sort_values(["query_id", "adc_dist", id_column],
                              kind="mergesort")
    out = parts.groupby("query_id", as_index=False, sort=True).head(k)
    out = out.reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount()
    return out


class _ADCTopK:
    """Per-batch ADC scan: gather-sum each query's (m, 256) LUT over the
    code matrix, keep the batch-local top-k — partials merge driver-side
    (≤ k rows per (batch, query))."""

    def __init__(self, luts_ref, k: int, id_column: str, code_column: str):
        self.luts_ref = luts_ref
        self.k = k
        self.id_column = id_column
        self.code_column = code_column
        self._luts = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._luts is None:
            lr = self.luts_ref
            self._luts = ray.get(lr) if not isinstance(lr, np.ndarray) else lr
        luts = self._luts  # (q, m, 256)
        m = luts.shape[1]
        codes = _codes_matrix(batch[self.code_column], m)
        n = len(codes)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        q_out, id_out, d_out = [], [], []
        cols = np.arange(m)
        for qi in range(luts.shape[0]):
            # ONE fancy-gather per query: lut[j, codes[:, j]] summed over j
            dist = luts[qi][cols[None, :], codes].sum(axis=1) if n else \
                np.zeros(0)
            part = _topk_tie_aware(dist, ids, self.k)
            if len(part):
                q_out.append(np.full(len(part), qi, dtype=np.int64))
                id_out.append(ids[part])
                d_out.append(dist[part])
        if not q_out:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                self.id_column: pa.array([], batch[self.id_column].type),
                "adc_dist": pa.array([], pa.float64()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate(q_out)),
            self.id_column: pa.array(np.concatenate(id_out)),
            "adc_dist": pa.array(np.concatenate(d_out).astype(np.float64)),
        })


def pq_topk(codes_ds, codebooks: np.ndarray, queries: np.ndarray, *,
            id_column: str = "vec_id", code_column: str = "pq_code",
            k: int = 10, batch_size: int = 65536) -> pd.DataFrame:
    """ADC top-k over an encoded dataset: per query the squared-distance
    LUT broadcasts once; candidates cost M uint8 gathers + a sum. Returns
    (query_id, id, adc_dist, rank) with rank 0 = nearest; ties broken by
    (adc_dist, id) for rerun determinism."""
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    m, kcb, dsub = codebooks.shape
    if q.shape[1] != m * dsub:
        raise ValueError(f"query dim {q.shape[1]} != codebook dim {m * dsub}")
    luts = np.zeros((len(q), m, 256))
    for j in range(m):
        sub = q[:, j * dsub:(j + 1) * dsub]
        # (q, kcb) squared distances, padded to the fixed 256-wide table
        d = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
        luts[:, j, :kcb] = d
        if kcb < 256:
            luts[:, j, kcb:] = np.inf
    ref = ray.put(luts)

    parts = codes_ds.map_batches(
        _ADCTopK(ref, k, id_column, code_column),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()
    return _merge_topk(parts, id_column, k)


# ---------------------------------------------------------------------------
# IVF-PQ: residual-encoded PQ inside coarse cells — the trillion-scale
# layout (IVFADC in Jégou et al. 2011): the coarse quantizer prunes the
# scan to nprobe cells, and PQ encodes the RESIDUAL (x − centroid), which
# captures within-cell structure plain PQ quantizes away.
# ---------------------------------------------------------------------------


class _IVFPQEncoder:
    """map_batches: embedding → (id, cell, pq_code of the residual)."""

    def __init__(self, state_ref, id_column: str, column: str):
        self.state_ref = state_ref
        self.id_column = id_column
        self.column = column
        self._st = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._st is None:
            st = self.state_ref
            coarse, cb = ray.get(st) if not isinstance(st, tuple) else st
            self._st = (coarse, cb, (coarse**2).sum(axis=1),
                        [(c**2).sum(axis=1) for c in cb])
        coarse, cb, coarse_sq, cb_sq = self._st
        emb = _embedding_matrix(batch[self.column])
        n = len(batch)
        m = len(cb)
        cells = np.zeros(n, dtype=np.int32)
        codes = np.zeros((n, m), dtype=np.uint8)
        if n:
            d = -2.0 * (emb @ coarse.T) + coarse_sq[None, :]
            cells = np.argmin(d, axis=1).astype(np.int32)
            resid = emb - coarse[cells]
            dsub = cb[0].shape[1]
            for j in range(m):
                sub = resid[:, j * dsub:(j + 1) * dsub]
                dj = -2.0 * (sub @ cb[j].T) + cb_sq[j][None, :]
                codes[:, j] = np.argmin(dj, axis=1).astype(np.uint8)
        code_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({
            self.id_column: batch[self.id_column],
            "cell": pa.array(cells, pa.int32()),
            "pq_code": code_arr,
        })


def ivfpq_build(
    ds,
    *,
    id_column: str = "vec_id",
    column: str = "embedding",
    dim: int,
    n_cells: int = 64,
    m: int = 8,
    nbits: int = 8,
    train_sample: int = 65536,
    approx_rows: int | None = None,
    iters: int = 12,
    seed: int = 7,
):
    """Train coarse centroids + residual codebooks on one bounded sample,
    then ONE streaming encode pass. Returns ``(coarse, codebooks,
    codes_ds)`` where ``codes_ds`` holds (id, cell, pq_code) —
    4 + M bytes of searchable state per vector."""
    import ray

    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    if approx_rows is None:
        approx_rows = ds.count()
    sample = sample_embedding_rows(ds, column=column, n=train_sample,
                                   approx_rows=approx_rows, seed=seed)
    x = np.asarray(sample, dtype=np.float64)
    x = x[np.lexsort(x.T)]
    coarse = _kmeans_euclid(x, n_cells, iters=iters, seed=seed)
    d = -2.0 * (x @ coarse.T) + (coarse**2).sum(axis=1)[None, :]
    resid = x - coarse[np.argmin(d, axis=1)]
    k = 1 << nbits
    dsub = dim // m
    codebooks = np.zeros((m, min(k, len(x)), dsub))
    for j in range(m):
        codebooks[j] = _kmeans_euclid(
            resid[:, j * dsub:(j + 1) * dsub], k, iters=iters, seed=seed + j
        )
    ref = ray.put((np.ascontiguousarray(coarse),
                   np.ascontiguousarray(codebooks)))
    codes_ds = ds.select_columns([id_column, column]).map_batches(
        _IVFPQEncoder(ref, id_column, column), batch_format="pyarrow"
    )
    return coarse, codebooks, codes_ds


class _IVFPQTopK:
    """Per-batch probed-cell ADC: rows outside every query's probe set are
    skipped; probed rows gather the (query, cell)-specific residual LUT."""

    def __init__(self, state_ref, k: int, id_column: str):
        self.state_ref = state_ref
        self.k = k
        self.id_column = id_column
        self._st = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._st is None:
            st = self.state_ref
            self._st = ray.get(st) if not isinstance(st, tuple) else st
        probed, luts = self._st  # probed (q, nprobe) cells; luts (q, nprobe, m, 256)
        m = luts.shape[2]
        codes = _codes_matrix(batch["pq_code"], m)
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        cols = np.arange(m)
        # bucketize the batch by cell ONCE (one argsort), instead of a
        # full cells==cell scan per (query, probe slot)
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        uniq_cells, starts = np.unique(sc, return_index=True)
        bounds = np.append(starts, len(sc))
        cell_rows = {
            int(c): order[bounds[i]:bounds[i + 1]]
            for i, c in enumerate(uniq_cells)
        }
        q_out, id_out, d_out = [], [], []
        for qi in range(probed.shape[0]):
            for slot, cell in enumerate(probed[qi]):
                rows = cell_rows.get(int(cell))
                if rows is None:
                    continue
                sub = codes[rows]
                dist = luts[qi, slot][cols[None, :], sub].sum(axis=1)
                part = _topk_tie_aware(dist, ids[rows], self.k)
                sel = rows[part]
                q_out.append(np.full(len(part), qi, dtype=np.int64))
                id_out.append(ids[sel])
                d_out.append(dist[part])
        if not q_out:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                self.id_column: pa.array([], batch[self.id_column].type),
                "adc_dist": pa.array([], pa.float64()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate(q_out)),
            self.id_column: pa.array(np.concatenate(id_out)),
            "adc_dist": pa.array(np.concatenate(d_out).astype(np.float64)),
        })


def ivfpq_topk(codes_ds, coarse: np.ndarray, codebooks: np.ndarray,
               queries: np.ndarray, *, id_column: str = "vec_id",
               k: int = 10, nprobe: int = 4,
               batch_size: int = 65536) -> pd.DataFrame:
    """Probed-cell residual ADC top-k. Each query probes its ``nprobe``
    nearest coarse cells; the LUT for (query, cell) quantizes
    ``(q − centroid_cell)`` against the residual codebooks, so
    ``LUT-sum ≡ ||q − (centroid + reconstructed residual)||²``. Broadcast
    state is (q × nprobe × m × 256) doubles — KBs. Returns (query_id, id,
    adc_dist, rank) with deterministic (adc_dist, id) tie-breaks."""
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    m, kcb, dsub = codebooks.shape
    if q.shape[1] != m * dsub:
        raise ValueError(f"query dim {q.shape[1]} != codebook dim {m * dsub}")
    dq = -2.0 * (q @ coarse.T) + (coarse**2).sum(axis=1)[None, :]
    nprobe = min(nprobe, coarse.shape[0])
    probed = np.argsort(dq, axis=1)[:, :nprobe].astype(np.int32)
    luts = np.zeros((len(q), nprobe, m, 256))
    for qi in range(len(q)):
        for slot, cell in enumerate(probed[qi]):
            r = q[qi] - coarse[cell]
            for j in range(m):
                sub = r[j * dsub:(j + 1) * dsub]
                d = ((sub[None, :] - codebooks[j]) ** 2).sum(axis=1)
                luts[qi, slot, j, :kcb] = d
                if kcb < 256:
                    luts[qi, slot, j, kcb:] = np.inf
    ref = ray.put((probed, luts))
    parts = codes_ds.map_batches(
        _IVFPQTopK(ref, k, id_column),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()
    return _merge_topk(parts, id_column, k)
