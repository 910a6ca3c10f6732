"""Mergeable sketches for distributed column stats.

Partial-per-block → merge is the only aggregation pattern that scales to
10^12 rows: each ``map_batches`` block emits one serialized sketch; the
driver (or a tiny follow-up stage) merges them. All sketches here are
commutative monoids, so merge order is free.

References: HyperLogLog (Flajolet et al., 2007); t-digest (Dunning &
Ertl, 2019). Fresh implementations over numpy.
"""

from __future__ import annotations

import math
import pickle

import numpy as np


def hash64(values: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit mix hash (splitmix64 finalizer) over an int64/uint64
    array. For strings use ``hash_strings``."""
    x = values.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hash_strings(values) -> np.ndarray:
    """64-bit hashes of a sequence of strings/bytes (vector loop over Python
    strings; zlib.crc32 pairs mixed — cheap and deterministic)."""
    import zlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if v is None:
            out[i] = 0
            continue
        b = v.encode("utf-8", "surrogatepass") if isinstance(v, str) else bytes(v)
        lo = zlib.crc32(b)
        hi = zlib.adler32(b + b"\x01")
        out[i] = (np.uint64(hi) << np.uint64(32)) | np.uint64(lo)
    return hash64(out)


# The RE2 whitespace class DuckDB's string_split_regex('\\s+') uses:
# [\t\n\f\r ] — note NO \v (Python's \s, even with re.ASCII, includes
# \x0b) and NO Unicode spaces (str.split() splits NBSP etc.). Every
# operator whose OUTPUT is compared against a SQL oracle tokenizes with
# THIS class so engine and oracle agree on arbitrary input, not just the
# space-only test corpus.
import re as _re

RE2_WS = _re.compile(r"[\t\n\f\r ]+")

# ASCII chars where str.split() and RE2 '\s' DISAGREE: \x0b (VT) plus
# \x1c-\x1f (FS/GS/RS/US) are Python str whitespace but not RE2 \s —
# the fast-path guard below rejects exactly these (chained `in` scans)


def re2_tokens(text) -> list:
    """Case-PRESERVING RE2-'\\s+'-split token list, empties dropped (the
    SQL oracles' ``WHERE word <> ''`` / trim() edge behavior). Used by
    token counting / chunking, where chunk text must keep its case.

    Fast path: for ASCII text without the divergent control chars
    (VT/FS/GS/RS/US, which Python ``str.split`` treats as whitespace but
    RE2's ``\\s`` does not; Unicode spaces need non-ASCII),
    C-level ``str.split()`` is IDENTICAL to the RE2 split and
    ~2.3× faster — the guard scans are C-speed, so hot 100%-of-corpus
    stages keep their throughput while hostile input takes the exact
    regex."""
    if not text:
        return []
    if text.isascii() and not (
        "\x0b" in text or "\x1c" in text or "\x1d" in text
        or "\x1e" in text or "\x1f" in text
    ):
        # chained C-level memchr scans beat one regex scan ~3× here
        return text.split()
    return [w for w in RE2_WS.split(text) if w]


def re2_words(text) -> list:
    """Lowercased :func:`re2_tokens` — the canonical tokenizer for every
    hash-emitting / oracle-compared operator.

    Known, documented divergence: lowercasing uses Python ``str.lower``,
    which differs from SQL/utf8proc on special casings (U+0130 'İ' →
    'i̇' here vs 'i' in DuckDB; ditto Cherokee, ligatures). The oracle
    contract is ASCII-exact; the comparison corpus is ASCII. The SPLIT
    itself is contract-exact on any input (see :func:`re2_tokens`)."""
    return re2_tokens(text.lower()) if text else []


def md5_hash_strings(values) -> np.ndarray:
    """64-bit word hashes as the FIRST 8 md5 bytes (big-endian). Slower
    than :func:`hash_strings` but exactly reproducible in ANSI SQL —
    DuckDB: ``('0x' || substr(md5(w), 1, 16))::UBIGINT`` — so operators
    whose OUTPUT embeds the hash (SimHash) stay oracle-comparable."""
    import hashlib

    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # hash DISTINCT values only, then scatter: natural text repeats words
    # 10-25×, so this cuts the per-value hashlib calls by the batch's
    # repetition factor on SimHash's 100%-of-corpus path
    arr = np.asarray(values, dtype=object)
    try:
        uniq, inverse = np.unique(arr, return_inverse=True)
    except TypeError:  # mixed str/bytes/None input is unsortable
        out = np.empty(n, dtype=np.uint64)
        for i, v in enumerate(values):
            b = (
                v.encode("utf-8", "surrogatepass")
                if isinstance(v, str)
                else bytes(v or b"")
            )
            out[i] = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
        return out
    uh = np.empty(len(uniq), dtype=np.uint64)
    for i, v in enumerate(uniq):
        b = (
            v.encode("utf-8", "surrogatepass")
            if isinstance(v, str)
            else bytes(v or b"")
        )
        uh[i] = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
    return uh[inverse]


def key_hashes(tbl, cols: list[str]) -> np.ndarray:
    """Combined 64-bit hash of one or more key columns of an Arrow table
    (vectorized; string keys via hash_strings, anything integral via the
    splitmix64 mixer). The shared bucket function for every hash-partitioned
    exchange (joins, large-cardinality combines)."""
    import pyarrow as pa

    h = None
    for c in cols:
        col = tbl[c]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            hc = hash_strings(col.to_pylist())
        else:
            if (col.null_count if hasattr(col, "null_count")
                    else sum(c.null_count for c in col.chunks)):
                # a single null forces Arrow's float64 conversion, which
                # maps nulls to INT64_MIN AND rounds valid keys > 2^53 —
                # fill with a placeholder so VALID keys hash exactly (null
                # keys never MATCH; the join layer enforces that)
                import pyarrow.compute as pc

                col = pc.fill_null(col, pa.scalar(0).cast(col.type))
            hc = hash64(
                col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            )
        h = hc if h is None else hash64(h * np.uint64(0x9E3779B97F4A7C15) + hc)
    return h


class HyperLogLog:
    """Dense HLL with 2^p registers (default p=12 → ~1.6% error, 4 KiB)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # sentinel bit keeps rest non-zero so rank is bounded by 64 - p + 1
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        rank = _clz64(rest) + 1
        np.maximum.at(self.registers, idx, rank.astype(np.uint8))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(2.0 ** (-self.registers.astype(np.float64))))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        return est

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        hll = cls(data[0])
        hll.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return hll


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 array via the float64 exponent (exact for
    the leading-bit position; values here are never 0 because a sentinel bit
    is OR'd in by the caller)."""
    # leading bit position = floor(log2(v)); safe because v >= 2^(p-1) > 0
    hi = (v >> np.uint64(32)).astype(np.float64)
    lo = (v & np.uint64(0xFFFFFFFF)).astype(np.float64)
    val = hi * 4294967296.0 + lo
    pos = np.floor(np.log2(val)).astype(np.int64)
    # correct off-by-one at exact powers of two from float rounding
    pow_check = np.where(pos < 63, (np.uint64(1) << pos.astype(np.uint64)) > v, False)
    pos = pos - pow_check.astype(np.int64)
    return (63 - pos).astype(np.uint8)


class TDigest:
    """Array-based mergeable t-digest (scale fn k1, compression δ)."""

    __slots__ = ("delta", "means", "weights", "_buf_m", "_buf_w")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_m: list = []
        self._buf_w: list = []

    def add_array(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self._buf_m.append(values)
        self._buf_w.append(np.ones(len(values)))
        if sum(len(b) for b in self._buf_m) > 32 * self.delta:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        # lazy: buffer the other digest's centroids and compress only when
        # the buffer is large — compressing per merge made a 600-fragment
        # driver reduce quadratic in Python-loop iterations
        other._compress()
        if len(other.means):
            self._buf_m.append(other.means)
            self._buf_w.append(other.weights)
            if sum(len(b) for b in self._buf_m) > 32 * self.delta:
                self._compress()
        return self

    def _compress(self) -> None:
        if self._buf_m:
            m = np.concatenate([self.means] + self._buf_m)
            w = np.concatenate([self.weights] + self._buf_w)
            self._buf_m, self._buf_w = [], []
        else:
            m, w = self.means, self.weights
        if len(m) == 0:
            return
        order = np.argsort(m, kind="mergesort")
        m, w = m[order], w[order]
        total = w.sum()
        out_m, out_w = [], []
        cur_m, cur_w = m[0], w[0]
        q0 = 0.0
        k_limit = 4.0 * total / self.delta
        for i in range(1, len(m)):
            q = q0 + cur_w / total
            limit = k_limit * q * (1.0 - q) + 1e-9
            if cur_w + w[i] <= limit:
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        self._compress()
        return pickle.dumps((self.delta, self.means, self.weights))

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        delta, means, weights = pickle.loads(data)
        td = cls(delta)
        td.means, td.weights = means, weights
        return td


class Histogram:
    """Fixed-bin histogram (mergeable) for KS/PSI drift checks over known
    numeric ranges (e.g. image w/h)."""

    __slots__ = ("edges", "counts")

    def __init__(self, lo: float, hi: float, bins: int = 64, counts=None):
        self.edges = np.linspace(lo, hi, bins + 1)
        self.counts = (
            np.zeros(bins, dtype=np.int64) if counts is None else np.asarray(counts)
        )

    def add_array(self, values: np.ndarray) -> None:
        c, _ = np.histogram(np.asarray(values, dtype=np.float64), bins=self.edges)
        self.counts += c

    def merge(self, other: "Histogram") -> "Histogram":
        self.counts += other.counts
        return self

    def psi(self, other: "Histogram", eps: float = 1e-6) -> float:
        p = self.counts / max(1, self.counts.sum()) + eps
        q = other.counts / max(1, other.counts.sum()) + eps
        return float(np.sum((p - q) * np.log(p / q)))

    def ks(self, other: "Histogram") -> float:
        p = np.cumsum(self.counts) / max(1, self.counts.sum())
        q = np.cumsum(other.counts) / max(1, other.counts.sum())
        return float(np.max(np.abs(p - q)))

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.edges, self.counts))

    @classmethod
    def from_bytes(cls, data: bytes) -> "Histogram":
        edges, counts = pickle.loads(data)
        h = cls(edges[0], edges[-1], len(edges) - 1, counts)
        h.edges = edges
        return h


def tree_reduce_blobs(blobs_ds, combine, *, fanin: int = 64) -> list:
    """Distributed tree reduce over a one-column (``blob``: binary) Dataset
    of serialized sketch partials: repartition into ``ceil(n/fanin)`` groups
    and merge each group in ONE task, repeating until at most ``fanin``
    blobs remain, which the caller merges driver-side.

    This replaces the serial ``iter_rows()`` driver loop — O(#blocks) on
    the driver — with O(log_fanin #blocks) rounds of parallel merges; at
    sf-scale block counts (n ≤ fanin) it degenerates to the direct driver
    merge with zero extra stages. ``combine`` takes a list of blobs and
    returns one blob; it must be associative + commutative (every sketch
    here is a monoid).
    """
    import math

    import pandas as pd

    ds = blobs_ds
    n = ds.count()  # blob datasets are KB-sized partials; count is cheap
    while n > fanin:
        n_groups = math.ceil(n / fanin)

        def merge_block(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                # a 0-row block after repartition must not synthesize a
                # combine([]) blob (e.g. pickled None) that poisons the
                # next merge round — emit nothing instead
                return pd.DataFrame({"blob": pd.Series([], dtype=object)})
            return pd.DataFrame({"blob": [combine(list(df["blob"]))]})

        ds = ds.repartition(n_groups).map_batches(
            merge_block, batch_format="pandas", batch_size=None
        ).materialize()
        n = n_groups
    return [row["blob"] for row in ds.iter_rows()]


class SpaceSaving:
    """Mergeable heavy-hitters sketch (SpaceSaving / Metwally et al.):
    tracks ~``capacity`` items with count over-estimates bounded by the
    evicted minimum. The approximate, shuffle-free counterpart of the
    exact df path in ``stages/corpus.boilerplate_ngrams``: one sketch per
    batch → driver (or tree) merge of KB-sized dicts, no key exchange at
    all. Guarantee: any item with true count > N/capacity survives, and
    ``count - error ≤ true ≤ count`` per surviving item.
    """

    __slots__ = ("capacity", "counts", "errors", "_heap")

    def __init__(self, capacity: int = 1024):
        self.capacity = capacity
        self.counts: dict = {}
        self.errors: dict = {}
        self._heap: list = []  # lazy (count, item) min-heap for eviction

    def add_many(self, items, weights=None) -> None:
        """Bulk insert: pre-aggregate the batch (vectorized) then do one
        dict pass per DISTINCT item — O(distinct), not O(rows)."""
        import collections

        if weights is None:
            agg = collections.Counter(items)
        else:
            agg = collections.defaultdict(int)
            for it, w in zip(items, weights):
                agg[it] += int(w)
        for item, w in agg.items():
            self._add(item, w)

    def _pop_min(self):
        """Current minimum via the lazy heap: stale entries (evicted items
        or outdated counts) are discarded / re-pushed on encounter —
        amortized O(log capacity) per eviction, never an O(capacity) scan."""
        import heapq

        counts = self.counts
        while True:
            c, item = self._heap[0]
            cur = counts.get(item)
            if cur is None:
                heapq.heappop(self._heap)
            elif cur != c:
                heapq.heapreplace(self._heap, (cur, item))
            else:
                heapq.heappop(self._heap)
                return item, c

    def _add(self, item, w: int) -> None:
        import heapq

        counts = self.counts
        if item in counts:
            counts[item] += w  # heap entry goes stale; fixed lazily
            return
        if len(counts) < self.capacity:
            counts[item] = w
            self.errors[item] = 0
            heapq.heappush(self._heap, (w, item))
            return
        # evict the current minimum; the newcomer inherits its count as
        # the over-estimate bound
        victim, floor = self._pop_min()
        counts.pop(victim)
        self.errors.pop(victim)
        counts[item] = floor + w
        self.errors[item] = floor
        heapq.heappush(self._heap, (floor + w, item))

    def _floor(self) -> int:
        """The count any UNTRACKED item could have accumulated before
        eviction: the sketch's minimum count when full, else 0."""
        if len(self.counts) < self.capacity:
            return 0
        return min(self.counts.values())

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Mergeable-summaries SpaceSaving merge (Agarwal et al.): an item
        absent from one side is credited that side's eviction FLOOR (its
        mass may live in another item's error there), keeping the
        ``count − error ≤ true ≤ count`` envelope valid across shards —
        summing only shared items would UNDER-estimate items evicted from
        some shard and break heavy-hitter survival."""
        import heapq

        fa, fb = self._floor(), other._floor()
        counts, errors = self.counts, self.errors
        for item in set(counts) | set(other.counts):
            ca = counts.get(item)
            cb = other.counts.get(item)
            if ca is None:
                counts[item] = cb + fa
                errors[item] = other.errors[item] + fa
            elif cb is None:
                counts[item] = ca + fb
                errors[item] = errors[item] + fb
            else:
                counts[item] = ca + cb
                errors[item] = errors[item] + other.errors[item]
        if len(counts) > self.capacity:
            keep = sorted(counts, key=counts.__getitem__, reverse=True)[
                : self.capacity
            ]
            self.counts = {k: counts[k] for k in keep}
            self.errors = {k: errors[k] for k in keep}
        self._heap = [(c, it) for it, c in self.counts.items()]
        heapq.heapify(self._heap)
        return self

    def topk(self, k: int) -> list[tuple]:
        """(item, count, error) for the k largest counts; an item is a
        GUARANTEED heavy hitter iff count − error exceeds the next count."""
        items = sorted(
            self.counts, key=self.counts.__getitem__, reverse=True
        )[:k]
        return [(it, self.counts[it], self.errors[it]) for it in items]
