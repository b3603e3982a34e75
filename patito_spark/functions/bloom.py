"""Distributed Bloom filter over 64-bit hash columns.

PySpark exposes no Bloom primitives (`bloom_filter_agg` /
`might_contain` are internal, unregistered expressions in this build),
so this is the classic two-stage construction Spark itself uses for
`DataFrameStatFunctions.bloomFilter` on the Scala side:

1. **build** — one pass over the (distinct) hash column; each PARTITION
   accumulates a local bitset in numpy and emits exactly one
   ``m/8``-byte row (``mapInPandas`` receives the whole partition as a
   batch iterator, so the partial is per-partition, not per-batch); the
   driver ORs the partials. Data moved to the driver is
   ``partitions × m/8`` bytes — independent of item count.
2. **probe** — the packed bitset ships once per executor as a Spark
   broadcast; membership tests are vectorized numpy over Arrow batches.

Bit positions use Kirsch–Mitzenmacher double hashing from one 64-bit
input hash (``pos_i = h1 + i·h2 mod m``, ``h1`` = the hash, ``h2`` = its
32-bit rotation forced odd): k positions from one hash evaluation, with
the standard result that the asymptotic false-positive rate matches
k independent hashes. Probes can only err toward *presence* (no false
negatives) — the safe direction for decontamination, where a false
positive merely over-removes one document.

Sizing: ``m = -n·ln(fpp)/ln(2)²`` bits, ``k = m/n·ln(2)`` probes — at
1% fpp that is ~9.6 bits (1.2 bytes) per distinct item, ~10× smaller
than broadcasting the raw 8-byte hashes and ~50× smaller than the
string set.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["BloomBits"]

_ROT = np.uint64(32)
_ONE = np.uint64(1)


def _as_uint64(hashes) -> np.ndarray:
    arr = np.asarray(hashes)
    if arr.dtype == np.uint64:
        return arr
    return arr.astype(np.int64, copy=False).view(np.uint64)


def _positions(h: np.ndarray, i: int, m: int) -> np.ndarray:
    """i-th Kirsch–Mitzenmacher position for each hash (uint64 wrap)."""
    h2 = ((h >> _ROT) | (h << _ROT)) | _ONE
    return ((h + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)


class BloomBits:
    """Immutable packed Bloom bitset (``uint64`` words) + its geometry."""

    def __init__(self, words: np.ndarray, m: int, k: int, n_items: int):
        self.words = words
        self.m = m
        self.k = k
        self.n_items = n_items

    @property
    def nbytes(self) -> int:
        return self.words.nbytes

    @staticmethod
    def geometry(n_items: int, fpp: float) -> tuple:
        """(m bits, k probes) for the target false-positive rate.

        ``m`` is floored at 1024 bits (128 bytes — free) so tiny item
        counts don't degenerate into a near-full bitset where individual
        probes collide deterministically; ``k`` is capped at 24 (a
        filter with spare bits gains nothing past ~2^-24 per probe and
        each extra hash costs a vectorized pass)."""
        n = max(n_items, 1)
        m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        m = max(m, 1024)
        k = max(1, min(24, int(round(m / n * math.log(2)))))
        return m, k

    @classmethod
    def build(
        cls,
        df: DataFrame,
        hash_col: str,
        n_items: Optional[int] = None,
        fpp: float = 0.01,
        max_bits: int = 1 << 31,
        distinct: bool = True,
    ) -> "BloomBits":
        """One distributed pass over ``df[hash_col]`` (bigint hashes).

        ``n_items`` sizes the filter; ``None`` counts the (distinct)
        column first — pass the known cardinality to skip that job.
        ``max_bits`` bounds broadcast size (default 2^31 bits = 256 MB,
        ~220M items at 1% fpp); an oversized request raises rather than
        silently degrading the error rate.
        """
        import pandas as pd

        src = df.select(hash_col)
        if distinct:
            src = src.distinct()
        if n_items is None:
            n_items = src.count()
        m, k = cls.geometry(n_items, fpp)
        if m > max_bits:
            raise ValueError(
                f"bloom filter needs {m} bits for n_items={n_items} at "
                f"fpp={fpp}, above max_bits={max_bits}; raise fpp or "
                "max_bits"
            )
        n_words = (m + 63) // 64

        schema = T.StructType([T.StructField("bits", T.BinaryType())])

        def partials(batches):
            words = np.zeros(n_words, dtype=np.uint64)
            seen = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                seen = True
                h = _as_uint64(pdf.iloc[:, 0].to_numpy())
                for i in range(k):
                    pos = _positions(h, i, m)
                    np.bitwise_or.at(
                        words, pos >> 6, _ONE << (pos & np.int64(63)).astype(np.uint64)
                    )
            if seen:
                yield pd.DataFrame({"bits": [words.tobytes()]})

        # Tree-reduce the per-partition bitsets EXECUTOR-SIDE (the
        # fit_pca discipline): the driver receives ONE m-bit array at
        # any partition count — the per-partition collect shipped
        # partitions × up-to-256MB partials to the driver, the exact
        # O(partitions × payload) shape fit_pca escaped in round 13.
        # Depth scales with log₈(P) so no reduce task ORs more than ~8
        # sibling bitsets at once.
        import math as _math

        partial_rdd = src.mapInPandas(partials, schema).rdd.map(
            lambda r: np.frombuffer(r["bits"], dtype=np.uint64)
        )
        p_count = max(partial_rdd.getNumPartitions(), 2)
        depth = max(2, int(_math.ceil(_math.log(p_count, 8))))
        try:
            words = partial_rdd.treeReduce(np.bitwise_or, depth=depth)
        except ValueError:  # empty RDD: no input rows at all
            words = np.zeros(n_words, dtype=np.uint64)
        return cls(words, m=m, k=k, n_items=n_items)

    def contains(self, hashes) -> np.ndarray:
        """Vectorized membership test; boolean array, no false negatives."""
        h = _as_uint64(hashes)
        hit = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            pos = _positions(h, i, self.m)
            word = self.words[pos >> 6]
            hit &= (
                (word >> (pos & np.int64(63)).astype(np.uint64)) & _ONE
            ).astype(bool)
        return hit
