"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Patterns (ray_guide "Aggregation at scale"):
  exact      — content hash per batch (vectorized) → hash-partitioned
               groupby → keep the min-id row per group
  minhash    — batch-vectorized signatures (one rolling-hash pass over the
               batch, per-perm minimum.reduceat) → fused explode to
               (band_id, band_hash, id) rows → bucketed groupby → candidate
               groups → pairwise signature-estimated Jaccard →
               size-adaptive pair dedup
  simhash    — 64-bit simhash per row; equal-prefix buckets group near-dups
  embedding  — random-hyperplane LSH buckets + exact cosine verify

Each stage emits only ids/hashes/signatures across shuffles — never the
original payload — so the wide steps stay narrow at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketches import RE2_WS, hash64, hash_strings, re2_words


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of character k-shingles of lowercased text."""
    t = " ".join(re2_words(text)) if text else ""
    if len(t) < k:
        t = t.ljust(k, "_")
    data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    # rolling windows → dot with byte weights → mix
    windows = np.lib.stride_tricks.sliding_window_view(data, min(k, len(data)))
    weights = (np.uint64(31) ** np.arange(windows.shape[1], dtype=np.uint64))
    with np.errstate(over="ignore"):
        raw = (windows.astype(np.uint64) * weights).sum(axis=1)
    return np.unique(hash64(raw))


class MinHasher:
    """Per-batch minhash signatures: ``num_perm`` permutations via the
    (a*x+b) mod p universal-hash family.

    ``signatures`` is the hot path: ONE rolling-hash pass over the batch's
    concatenated normalized bytes, then per-permutation universal hashes
    reduced to per-document minima with ``np.minimum.reduceat`` — no Python
    loop over rows (the round-1 per-row variant was 41% of the driver bench).
    ``signature`` keeps the row-at-a-time formulation as the independently
    written parity reference for tests."""

    def __init__(
        self,
        column: str = "text",
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        seed: int = 7,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.column = column
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.a = rng.integers(1, 2**61 - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 2**61 - 1, size=num_perm, dtype=np.uint64)
        self.p = np.uint64(2**61 - 1)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hashes → min along shingles
            vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % self.p
        return vals.min(axis=1)

    def signatures(self, texts) -> np.ndarray:
        """Vectorized signatures for a batch: (n_docs, num_perm) uint64,
        bit-identical to ``signature`` per row."""
        k = self.shingle_k
        parts = []
        for t in texts:
            s = " ".join(re2_words(t)) if t else ""
            if len(s) < k:
                s = s.ljust(k, "_")
            parts.append(s.encode("utf-8"))
        n = len(parts)
        if n == 0:
            return np.zeros((0, self.num_perm), dtype=np.uint64)
        data = np.frombuffer(b"".join(parts), dtype=np.uint8)
        lengths = np.fromiter((len(p) for p in parts), count=n, dtype=np.int64)
        offsets = np.concatenate(([0], np.cumsum(lengths)))
        # rolling polynomial hash of every k-byte window of the concatenated
        # buffer; windows that straddle document boundaries are skipped by
        # the per-document index gather below
        W = len(data) - k + 1
        raw = np.zeros(W, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                raw += data[j : j + W].astype(np.uint64) * (np.uint64(31) ** np.uint64(j))
        sh = hash64(raw)
        vcounts = lengths - (k - 1)  # valid window starts per doc (≥1: padded)
        seg_starts = np.concatenate(([0], np.cumsum(vcounts)[:-1]))
        V = int(vcounts.sum())
        idx = (
            np.arange(V, dtype=np.int64)
            - np.repeat(seg_starts, vcounts)
            + np.repeat(offsets[:-1], vcounts)
        )
        hv = sh[idx]
        sig = np.empty((self.num_perm, n), dtype=np.uint64)
        tmp = np.empty(V, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # one 1-D in-place pass per permutation: a 2-D uint64 broadcast
            # multiply here hit a non-SIMD numpy path 25× slower than these
            # contiguous in-place kernels (measured)
            for j in range(self.num_perm):
                np.multiply(hv, self.a[j], out=tmp)
                np.add(tmp, self.b[j], out=tmp)
                np.remainder(tmp, self.p, out=tmp)
                sig[j] = np.minimum.reduceat(tmp, seg_starts)
        return sig.T

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch[self.column].to_pylist())
        n = len(sigs)
        flat = pa.array(sigs.astype(np.int64).reshape(-1), pa.int64())
        list_offsets = pa.array(
            np.arange(0, (n + 1) * self.num_perm, self.num_perm, dtype=np.int32)
        )
        arr = pa.ListArray.from_arrays(list_offsets, flat)
        return batch.append_column("minhash", arr)


class BandExploder:
    """Explode signatures into (band_id, band_hash, id, minhash) rows for
    the LSH groupby. Band hashes are computed vectorized over the whole
    batch: (n, bands, rows_per_band) → mix → (n, bands)."""

    def __init__(self, id_column: str, bands: int = 16, rows_per_band: int = 4):
        self.id_column = id_column
        self.bands = bands
        self.rows_per_band = rows_per_band

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column]
        sigs = batch["minhash"].to_pylist()
        n = len(sigs)
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    self.id_column: pa.array([], ids.type),
                    "minhash": pa.array([], pa.list_(pa.int64())),
                }
            )
        sig_mat = np.asarray(sigs, dtype=np.uint64).reshape(
            n, self.bands, self.rows_per_band
        )
        with np.errstate(over="ignore"):
            band_offsets = np.arange(self.bands, dtype=np.uint64)[None, :, None]
            mixed = hash64((sig_mat + band_offsets).reshape(-1)).reshape(
                n, self.bands, self.rows_per_band
            )
            band_hash = (
                mixed.sum(axis=2, dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF)
            ).astype(np.int64)
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)
        # each source row repeats `bands` times
        idx = np.repeat(np.arange(n), self.bands)
        # signatures travel as fixed-width binary — a list<int64> column
        # multiplied sort-shuffle payload and serialization cost. Stored
        # minima are quantized to their low 16 bits: the estimator only
        # tests ENTRY EQUALITY, and two distinct minima colliding in 16
        # bits inflates est_jaccard by ~(1-j)·2^-16 — irrelevant at any
        # usable threshold — while the shuffle payload shrinks 4×.
        sig16 = (sig_mat & np.uint64(0xFFFF)).astype(np.uint16)
        sig_blobs = [sig16[i].tobytes() for i in range(n)]
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_hash": pa.array(band_hash.reshape(-1), pa.int64()),
                self.id_column: ids.take(pa.array(idx)),
                "minhash": pa.array([sig_blobs[i] for i in idx], pa.binary()),
            }
        )


class MinHashBands:
    """Fused signatures → band hashes → exploded (band_id, band_hash, id,
    minhash-blob) rows in one numpy flow. Composing ``MinHasher`` then
    ``BandExploder`` keeps an intermediate ``list<int64>`` Arrow column
    that costs a to_pylist/from_list round trip per batch; this stage goes
    straight from the (n, num_perm) signature matrix to the exploded
    table. Signatures travel as fixed-width binary blobs (a list<int64>
    column multiplied sort-shuffle payload and serialization cost)."""

    def __init__(self, column: str, id_column: str, *, num_perm: int = 64,
                 bands: int = 16, shingle_k: int = 5, seed: int = 7):
        self.hasher = MinHasher(column=column, num_perm=num_perm,
                                bands=bands, shingle_k=shingle_k, seed=seed)
        self.id_column = id_column
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column]
        sig_mat = self.hasher.signatures(batch[self.hasher.column].to_pylist())
        n = len(sig_mat)
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    self.id_column: pa.array([], ids.type),
                    "minhash": pa.array([], pa.binary()),
                }
            )
        sig3 = sig_mat.reshape(n, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            band_offsets = np.arange(self.bands, dtype=np.uint64)[None, :, None]
            mixed = hash64((sig3 + band_offsets).reshape(-1)).reshape(
                n, self.bands, self.rows_per_band
            )
            band_hash = (
                mixed.sum(axis=2, dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF)
            ).astype(np.int64)
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)
        idx = np.repeat(np.arange(n), self.bands)
        blob_width = self.bands * self.rows_per_band * 2
        # one repeated buffer → FixedSizeBinary column, no per-row tobytes;
        # minima quantized to 16 bits (see BandExploder note: equality-only
        # estimator, ~2^-16 bias, 4× less shuffle payload)
        sig16 = (sig_mat & np.uint64(0xFFFF)).astype(np.uint16)
        repeated = np.repeat(sig16, self.bands, axis=0)
        blobs = pa.Array.from_buffers(
            pa.binary(blob_width), n * self.bands,
            [None, pa.py_buffer(np.ascontiguousarray(repeated).tobytes())],
        )
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_hash": pa.array(band_hash.reshape(-1), pa.int64()),
                self.id_column: ids.take(pa.array(idx)),
                "minhash": blobs.cast(pa.binary()),
            }
        )


def _derive_num_buckets(approx_rows: int | None, *, rows_per_bucket: int = 4096,
                        floor_per_cpu: int = 2, lo: int = 32, hi: int = 1 << 20) -> int:
    """Power-of-two shuffle bucket count scaled to data size (when known)
    and cluster width — replaces round 1's fixed 128, whose per-bucket group
    size grew linearly with the dataset."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    want = cpus * floor_per_cpu
    if approx_rows:
        want = max(want, approx_rows // rows_per_bucket)
    want = min(hi, max(lo, want))
    return 1 << (want - 1).bit_length()


def minhash_lsh_pairs(ds, column: str, id_column: str, *, num_perm=64, bands=16,
                      min_jaccard: float = 0.5, batch_size: int = 4096,
                      num_buckets: int | None = None, approx_rows: int | None = None,
                      pair_dedup_threshold: int = 2_000_000):
    """Near-duplicate candidate pairs with signature-estimated Jaccard.

    Returns a Dataset of (id_a, id_b, est_jaccard), id_a < id_b, deduped.

    Shuffle keys are coarse buckets of the band hash (and of the pair key
    for the final dedup) — one Ray group per bucket, with the exact
    per-(band, band_hash) candidate grouping done vectorized inside the
    bucket, so per-group task overhead stays O(num_buckets). ``num_buckets``
    defaults to a power of two scaled to ``approx_rows`` / cluster CPUs.

    The candidate-pair set is materialized (it is the *reduced* output —
    ids + estimates only, never payload) and counted: small pair sets dedup
    in one coalesced task; above ``pair_dedup_threshold`` (e.g. crawl
    workloads with 20-50% dup rates, where pairs are O(dataset)) the dedup
    runs as a pair-key-bucketed groupby so no single task holds all pairs.
    """
    import pandas as pd

    if num_buckets is None:
        num_buckets = _derive_num_buckets(approx_rows)
    # NB: a batch_size above the block size makes Ray bundle blocks into
    # fewer signature tasks — measured FASTER here than per-block batching
    # (batch_size=None read 4.6 s vs 1.6 s: 64 toy blocks = 64 tiny tasks
    # of pure overhead); at real scale blocks are >=128 MB so task count is
    # block count either way
    exploded = ds.select_columns([id_column, column]).map_batches(
        MinHashBands(column, id_column, num_perm=num_perm, bands=bands),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bucket = pc.cast(
            pc.bit_wise_and(batch["band_hash"], num_buckets - 1), pa.int32()
        )
        return batch.append_column("__bucket", bucket)

    _triu_cache: dict = {}

    def _triu(k: int):
        got = _triu_cache.get(k)
        if got is None:
            got = _triu_cache[k] = np.triu_indices(k, 1)
        return got

    def emit_pairs(bucket_group: pd.DataFrame) -> pd.DataFrame:
        # One vectorized pass per bucket (per-group pandas iteration cost
        # ~370 µs × 10^4 groups): keep only rows whose band hash repeats,
        # sort once, build ragged all-pairs index arrays per group, compare
        # every candidate pair's signatures in chunked numpy.
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "est_jaccard": pd.Series([], dtype=float)}
        )
        g = bucket_group[
            bucket_group.duplicated(["band_id", "band_hash"], keep=False)
        ]
        if g.empty:
            return empty
        g = g.sort_values(["band_id", "band_hash", id_column], kind="mergesort")
        ids = g[id_column].to_numpy()
        bh = g["band_hash"].to_numpy()
        bi = g["band_id"].to_numpy()
        boundary = np.flatnonzero(
            np.concatenate(([True], (bh[1:] != bh[:-1]) | (bi[1:] != bi[:-1])))
        )
        counts = np.diff(np.concatenate((boundary, [len(g)])))
        pair_i, pair_j = [], []
        for s, k in zip(boundary.tolist(), counts.tolist()):
            if k < 2:
                continue
            ii, jj = _triu(k)
            pair_i.append(ii + s)
            pair_j.append(jj + s)
        if not pair_i:
            return empty
        I = np.concatenate(pair_i)
        J = np.concatenate(pair_j)
        sig = np.frombuffer(b"".join(g["minhash"]), dtype=np.uint16).reshape(
            len(g), -1
        )
        ests = np.empty(len(I), dtype=np.float64)
        chunk = 65536  # bound the gathered operand allocation
        for s in range(0, len(I), chunk):
            e = min(len(I), s + chunk)
            ests[s:e] = (sig[I[s:e]] == sig[J[s:e]]).mean(axis=1)
        keep = (ests >= min_jaccard) & (ids[I] != ids[J])
        return pd.DataFrame(
            {
                "id_a": ids[I[keep]],
                "id_b": ids[J[keep]],
                "est_jaccard": ests[keep],
            }
        )

    pairs = (
        exploded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(emit_pairs, batch_format="pandas")
    )

    return dedup_pair_dataset(
        pairs, value_columns=["est_jaccard"],
        pair_dedup_threshold=pair_dedup_threshold,
    )


def dedup_pair_dataset(pairs, *, value_columns: list[str],
                       pair_dedup_threshold: int = 2_000_000):
    """Drop duplicate (id_a, id_b) pairs, picking the exchange by the pair
    set's ACTUAL size: the pair Dataset (ids + small values only — never
    payload) is materialized (tiny object-store blocks) and counted; small
    violation sets dedup DRIVER-SIDE in one vectorized pandas call (the
    blocks are already counted small — a Repartition(1) round-trip here
    measured 2-3 s of pure Ray stage overhead at sf0.1 for <1 ms of
    work), large ones (dup-heavy crawl workloads where pairs are
    O(dataset)) dedup as a pair-key-bucketed groupby so no single task
    holds all pairs."""
    import pandas as pd

    import ray.data as rd

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    out_cols = ["id_a", "id_b"] + value_columns

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        out = df.sort_values(["id_a", "id_b"]).drop_duplicates(["id_a", "id_b"])
        return out[out_cols]

    if n_pairs <= pair_dedup_threshold:
        if not n_pairs:
            # hand back the (empty, already materialized) input: it keeps
            # whatever id/value types the producer declared — an empty
            # pandas frame here would infer every column as double
            return pairs
        out = dedup_pairs(pairs.to_pandas())[out_cols]
        # split into multiple blocks so a downstream per-pair verify
        # parallelizes (one driver-side dedup, no extra Ray stage)
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        nchunks = max(1, min(cpus * 2, len(out) // 4096))
        if nchunks <= 1:
            return rd.from_pandas(out)
        return rd.from_pandas(
            [c.reset_index(drop=True) for c in np.array_split(out, nchunks)]
        )

    pair_buckets = _derive_num_buckets(n_pairs)

    def add_pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["id_a", "id_b"]], index=False)
        return df.assign(
            __pb=(h.to_numpy() & np.uint64(pair_buckets - 1)).astype(np.int64)
        )

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pandas")
        .groupby("__pb")
        .map_groups(
            lambda df: dedup_pairs(df.drop(columns="__pb")), batch_format="pandas"
        )
    )


class SimHasher:
    """64-bit SimHash over word hashes; ``simhash_bucket`` = top-``prefix``
    bits for bucketed near-dup grouping.

    ``simhashes`` is the hot path: one word-hash pass over the batch's
    concatenated word list, per-bit ones-counts via ``np.add.reduceat``
    per document, sign-threshold, one packed shift-sum — no per-row
    64-iteration bit loop. ``simhash`` keeps the row-at-a-time
    formulation as the parity reference for tests.

    Word hashes are :func:`..sketches.md5_hash_strings` (md5 low-64) —
    unlike every other dedup operator, SimHash's hash IS the output, so
    it must be reproducible by the SQL oracle. Tokenization is therefore
    the exact RE2 class (``sketches.RE2_WS`` = [\\t\\n\\f\\r ]), matching
    the oracle's ``string_split_regex('\\s+')`` — Python's ``str.split``
    would split U+00A0/U+2009 etc., and even ``re.ASCII \\s`` would split
    \\x0b, which RE2's ``\\s`` does not.
    (Remaining theoretical divergence: ``lower()`` on non-ASCII letters;
    the oracle comparison corpus is ASCII.)"""

    def __init__(self, column: str = "text", prefix_bits: int = 16):
        self.column = column
        self.prefix_bits = prefix_bits

    @staticmethod
    def _words(text: str) -> list[str]:
        if not text:
            return []
        return [w for w in RE2_WS.split(text.lower()) if w]

    def simhash(self, text: str) -> int:
        from .sketches import md5_hash_strings

        words = self._words(text)
        if not words:
            return 0
        # NB: deterministic hashing (not builtin hash(): PYTHONHASHSEED varies
        # per Ray worker process)
        hs = md5_hash_strings(words)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (bits * 2 - 1).sum(axis=0)
        out = np.uint64(0)
        for i in range(64):
            if v[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out & np.uint64(0x7FFFFFFFFFFFFFFF))

    def simhashes(self, texts) -> np.ndarray:
        """Vectorized simhashes for a batch: (n_docs,) uint64, equal to
        ``simhash`` per row."""
        from .sketches import md5_hash_strings

        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        if n == 0:
            return out
        word_lists = [self._words(t) for t in texts]
        counts = np.fromiter((len(w) for w in word_lists), count=n, dtype=np.int64)
        all_words = [w for ws in word_lists for w in ws]
        if not all_words:
            return out
        hs = md5_hash_strings(all_words)
        word_starts = np.concatenate(([0], np.cumsum(counts)))
        doc_idx = np.flatnonzero(counts > 0)
        seg = word_starts[doc_idx]  # contiguous: empty docs contribute no words
        nz_counts = counts[doc_idx]
        packed = np.zeros(len(doc_idx), dtype=np.uint64)
        tmp = np.empty(len(hs), dtype=np.uint64)
        one = np.uint64(1)
        # one 1-D pass per bit (2-D uint64 broadcasts hit a slow numpy path)
        for j in range(64):
            np.right_shift(hs, np.uint64(j), out=tmp)
            np.bitwise_and(tmp, one, out=tmp)
            ones = np.add.reduceat(tmp, seg)
            # bit set where signed vote 2*ones - n_words > 0
            packed |= (2 * ones > nz_counts).astype(np.uint64) << np.uint64(j)
        out[doc_idx] = packed & np.uint64(0x7FFFFFFFFFFFFFFF)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = self.simhashes(batch[self.column].to_pylist())
        out = batch.append_column(
            "simhash", pa.array(vals.astype(np.int64), pa.int64())
        )
        bucket = (vals >> np.uint64(63 - self.prefix_bits)).astype(np.int64)
        return out.append_column("simhash_bucket", pa.array(bucket, pa.int64()))


def exact_dedup(ds, column: str, id_column: str, *, batch_size: int = 8192,
                num_buckets: int | None = None, approx_rows: int | None = None,
                keep_payload: bool = True):
    """Exact dedup: keep the minimum-id row per distinct column value.
    Equivalent SQL: SELECT min(id), value GROUP BY value.

    Scale shape:
      1. per batch (vectorized): content hash per row, then a local
         pre-reduction keeping only the min-id row per distinct value — so
         each distinct value's payload crosses the shuffle at most once per
         batch it appears in, never once per row (round 1 shuffled every
         row's full text);
      2. shuffle key = ``content_hash & (num_buckets-1)`` with bucket count
         scaled to data/cluster size (round 1's fixed 128 made group size
         O(dataset)); the hash is ONLY a partitioning key — the final dedup
         compares the column value itself, so hash collisions cannot merge
         distinct values;
      3. vectorized min-id dedup inside each bucket group.

    With ``keep_payload=False`` the output is (id, content_hash) and the
    payload column never crosses the shuffle at all — the right call at
    100 TB when the caller only needs surviving ids (there the dedup key is
    the 64-bit hash itself; collisions merge distinct values at ~n²/2⁶⁵
    probability — callers needing exactness at 10^12 rows keep the payload).
    """
    import pandas as pd

    if num_buckets is None:
        num_buckets = _derive_num_buckets(approx_rows)
    out_cols = [id_column, column] if keep_payload else [id_column, "__h"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_strings(df[column].tolist()).astype(np.int64)
        df = df.assign(
            __h=h, __bucket=(h & np.int64(num_buckets - 1)).astype(np.int32)
        )
        df = df.sort_values(id_column).drop_duplicates(subset=[column], keep="first")
        return df[out_cols + ["__bucket"]]

    dedup_key = column if keep_payload else "__h"

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(id_column).drop_duplicates(
            subset=[dedup_key], keep="first"
        )
        return out[out_cols]

    return (
        ds.select_columns([id_column, column])
        .map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby("__bucket")
        .map_groups(keep_min, batch_format="pandas")
    )


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (verification kernel for candidates)."""
    sa, sb = set(_shingle_hashes(a, k).tolist()), set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


# --- perceptual-hash (Hamming) near-duplicates ------------------------------

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy <2 has no bitwise_count): byte-view
    table lookup + row sum."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1, dtype=np.int64)


def phash_hamming_pairs(
    ds,
    *,
    phash_column: str = "phash",
    id_column: str = "image_id",
    max_hamming: int = 3,
    bands: int = 4,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
    bucket_cap: int = 2048,
):
    """Near-duplicate detection over perceptual hashes (images): pairs of
    DISTINCT phash values within ``max_hamming`` bits of each other.

    Three phases, each chosen for the 10^12-row shape:

    * **Collapse** — identical phashes reduce to one representative
      (min id) + member count under a bucketed exchange. This is what
      defuses the hot-phash bucket the north-star names (10% of a crawl
      sharing one hash): an exact group NEVER expands pairwise here —
      exact duplicates are ``exact_dedup``'s output, keyed by the group
      row this phase emits. Only (phash, min_id, n) rows continue.
    * **Band LSH** — the 64-bit hash splits into ``bands`` disjoint
      ``64/bands``-bit bands; by pigeonhole any pair with hamming <
      ``bands`` collides exactly on ≥1 band (``max_hamming`` must be <
      ``bands``). Each distinct phash emits ``bands`` narrow rows into a
      (band, band-value)-hashed bucket exchange.
    * **Verify** — per exact band-match group, vectorized XOR+popcount
      over the pair triangle (groups capped at ``bucket_cap`` — a random
      16-bit band value collides ~n/2^16 times, so real groups are tiny);
      cross-band duplicate pairs dedup via ``dedup_pair_dataset``.

    Returns (id_a, id_b, hamming, n_a, n_b): representative ids ordered
    ascending, with each side's exact-group member count.
    """
    import pandas as pd

    band_bits = 64 // bands
    if bands * band_bits != 64:
        raise ValueError(f"bands must divide 64, got {bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < bands "
            f"({max_hamming} >= {bands})"
        )
    if num_buckets is None:
        num_buckets = _derive_num_buckets(approx_rows)
    mask = np.uint64(num_buckets - 1)
    band_mask = np.uint64((1 << band_bits) - 1)

    # phase 1: per-batch pre-reduce to distinct (phash, min id, count)
    def collapse_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(phash_column, as_index=False).agg(
            __id=(id_column, "min"), __n=(id_column, "size")
        )
        return g

    def collapse_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(phash_column, as_index=False).agg(
            __id=("__id", "min"), __n=("__n", "sum")
        )

    from .aggregate import bucketed_groups

    distinct = bucketed_groups(
        ds.select_columns([id_column, phash_column]).map_batches(
            collapse_partial, batch_format="pandas"
        ),
        [phash_column],
        collapse_bucket,
        num_buckets=num_buckets,
    )

    # phase 2: band rows → (band, value)-hashed bucket exchange
    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        ph = df[phash_column].to_numpy().astype(np.uint64)
        n = len(ph)
        frames = []
        for b in range(bands):
            bv = (ph >> np.uint64(b * band_bits)) & band_mask
            key = bv * np.uint64(0x9E3779B97F4A7C15) + np.uint64(
                (b * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            )
            frames.append(
                pd.DataFrame(
                    {
                        "__b": ((key >> np.uint64(32)) & mask).astype(
                            np.int32
                        ),
                        "__band": np.full(n, b, dtype=np.int8),
                        "__bv": bv.astype(np.int64),
                        "__ph": ph.astype(np.int64),
                        "__id": df["__id"].to_numpy(),
                        "__n": df["__n"].to_numpy(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def _run_pair_chunks(s: int, k: int):
        """Yield (ia, ib) global-index chunks covering the FULL pair
        triangle of the run starting at ``s`` with length ``k``.

        Runs up to ``bucket_cap`` emit one triangle.  Oversized runs
        (structured corpora where many distinct hashes share a band value
        — e.g. near-uniform images) are verified in ``bucket_cap``-sized
        index blocks: exact, memory bounded by cap², and NO pairs dropped
        — the previous behavior silently truncated the run at the cap,
        losing true near-duplicate pairs with no signal.
        """
        if k <= bucket_cap:
            ia, ib = np.triu_indices(k, 1)
            yield ia + s, ib + s
            return
        edges = list(range(0, k, bucket_cap)) + [k]
        for i in range(len(edges) - 1):
            lo_i, hi_i = edges[i], edges[i + 1]
            ni = hi_i - lo_i
            # diagonal block: in-block triangle
            ia, ib = np.triu_indices(ni, 1)
            yield ia + (s + lo_i), ib + (s + lo_i)
            for j in range(i + 1, len(edges) - 1):
                lo_j, hi_j = edges[j], edges[j + 1]
                nj = hi_j - lo_j
                # off-diagonal block: full cross product, 1-D repeat/tile
                # (2-D uint64 broadcasts hit numpy's non-SIMD path)
                yield (
                    np.repeat(np.arange(s + lo_i, s + hi_i), nj),
                    np.tile(np.arange(s + lo_j, s + hi_j), ni),
                )

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized run detection over the sorted frame: almost every
        # (band, value) run has length 1 (random band collisions are
        # ~n/2^band_bits), so pair generation only ever touches the rare
        # multi-member runs — never a per-subgroup pandas loop
        d = df.sort_values(["__band", "__bv", "__id"], kind="mergesort")
        band = d["__band"].to_numpy()
        bv = d["__bv"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(
                ([True], (band[1:] != band[:-1]) | (bv[1:] != bv[:-1]))
            )
        )
        lens = np.diff(np.concatenate((starts, [len(d)])))
        ph = d["__ph"].to_numpy().astype(np.uint64)
        ids = d["__id"].to_numpy()
        ns = d["__n"].to_numpy()
        hits_a, hits_b, hits_h = [], [], []
        for s, k in zip(starts[lens >= 2].tolist(),
                        lens[lens >= 2].tolist()):
            for ia, ib in _run_pair_chunks(s, k):
                hd = _popcount64(ph[ia] ^ ph[ib])
                sel = hd <= max_hamming
                if sel.any():
                    hits_a.append(ia[sel])
                    hits_b.append(ib[sel])
                    hits_h.append(hd[sel])
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=df["__id"].dtype),
                "id_b": pd.Series([], dtype=df["__id"].dtype),
                "hamming": pd.Series([], dtype="int64"),
                "n_a": pd.Series([], dtype="int64"),
                "n_b": pd.Series([], dtype="int64"),
            }
        )
        if not hits_a:
            return empty
        ia = np.concatenate(hits_a)
        ib = np.concatenate(hits_b)
        hd = np.concatenate(hits_h)
        swap = ids[ia] > ids[ib]
        a = np.where(swap, ib, ia)
        b = np.where(swap, ia, ib)
        return pd.DataFrame(
            {
                "id_a": ids[a],
                "id_b": ids[b],
                "hamming": hd,
                "n_a": ns[a],
                "n_b": ns[b],
            }
        )

    pairs = (
        distinct.map_batches(band_rows, batch_format="pandas")
        .groupby("__b")
        .map_groups(verify_bucket, batch_format="pandas")
    )
    return dedup_pair_dataset(pairs, value_columns=["hamming", "n_a", "n_b"])
