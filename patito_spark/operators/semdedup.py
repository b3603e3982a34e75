"""SemDeDup-style semantic deduplication over embedding columns.

The published method (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): cluster
the corpus embeddings with a coarse k-means quantizer, then — within each
cluster only — treat pairs above a cosine-similarity threshold as
semantic duplicates and keep one representative per duplicate group (the
paper keeps the member LEAST similar to its cluster centroid, retaining
the most "extreme" exemplar).

Spark-first shape, reusing the existing primitives end-to-end:

* clustering = :class:`~patito_spark.operators.similarity.IvfIndex`
  (sample-fit KMeans or caller-fixed centroids; the same index can serve
  ANN search AND semantic dedup — one corpus scan, one assignment);
* within-cell scoring = the blocked-cross-product verifier pattern from
  ``embedding_dedup_pairs`` keyed by ``(cell, block_a, block_b)``, so a
  mega-cell is scored by many bounded-memory tasks instead of one;
* duplicate groups = :func:`~patito_spark.operators.graph.connected_components`
  over the verified pairs; the drop set is a LEFT ANTI join, exactly the
  ``dedup_corpus`` composition.

Scale honesty: SemDeDup's compute is inherently quadratic *per cell*
(every in-cell pair is scored exactly). ``auto_n_centroids`` sizes cells
at ~sqrt(n), so total pair-work grows ~n^1.5 — the published method's
cost, not an artifact of this implementation; ``n_blocks`` bounds task
memory, never total flops. For a cheaper screen at the same threshold use
``embedding_dedup_pairs_lsh`` (near-linear, recall documented in
docs/scaling.md); SemDeDup's value is exact *within-cluster* recall with
a semantically meaningful blocking.

No reference counterpart (patito has no embedding operators); cited
design inputs are the public SemDeDup paper and this repo's own
similarity/graph layers.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from patito_spark.functions.cache import cache_scope

__all__ = ["semantic_dedup_pairs", "semantic_dedup"]


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    index=None,
    n_centroids: Optional[int] = None,
    seed: int = 42,
    n_blocks: int = 1,
) -> DataFrame:
    """Within-cluster pairs with cosine ≥ ``threshold``, plus each
    endpoint's similarity to its cluster centroid.

    Returns ``(id_a, id_b, cosine, cent_sim_a, cent_sim_b)`` with
    ``id_a < id_b``. Pairs are EXACT within a cell (sequential-fold
    accumulation, bit-reproducible) and never cross cells — that is the
    SemDeDup contract: the quantizer IS the blocking function.

    Args:
        index: a prebuilt
            :class:`~patito_spark.operators.similarity.IvfIndex` to
            reuse (build once with ``build_ivf_index(...,
            assign_metric="cosine")``, share with ``ann_ivf_topk``).
            When ``None`` an index is fit here (KMeans on a hash-sampled
            slice, cosine assignment) and NOT retained afterwards.
        n_centroids: cell count when fitting here; ``None`` auto-sizes
            to ~sqrt(n) (cells and cell size both grow as sqrt(n)).
        n_blocks: block count for the within-cell cross product. Each
            scoring task holds two blocks of one cell — raise this when
            cells outgrow executor memory (10⁵+ vectors/cell); total
            flops are unchanged.
    """
    import numpy as np
    import pandas as pd

    from patito_spark.functions.vector_numpy import (
        _as_matrix,
        seq_dot_matrix,
        seq_norm,
    )
    from patito_spark.operators.similarity import build_ivf_index

    if index is None:
        index = build_ivf_index(
            df,
            id_col=id_col,
            vec_col=vec_col,
            n_centroids=n_centroids,
            seed=seed,
            assign_metric="cosine",
            materialize=False,
        )
    centroids = np.asarray(index.centroids, dtype="float64")
    cent_norm = seq_norm(centroids)

    assigned = index.table.select(
        "cell",
        F.col("neighbor_id").alias("id"),
        F.col("__cvec").alias("vec"),
        F.pmod(F.xxhash64("neighbor_id"), F.lit(n_blocks)).alias("__blk"),
    )
    # Route each row to every (block_a, block_b) pair it participates in
    # within its cell — one explode, no pair join (the
    # embedding_dedup_pairs routing, keyed by cell as well).
    routed = assigned.withColumn(
        "__bp",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                lambda i: F.struct(
                    F.least(F.col("__blk"), i).alias("pa"),
                    F.greatest(F.col("__blk"), i).alias("pb"),
                ),
            )
        ),
    ).select(
        "cell",
        "id",
        "vec",
        "__blk",
        F.col("__bp.pa").alias("pa"),
        F.col("__bp.pb").alias("pb"),
    )

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type, True),
            T.StructField("id_b", id_type, True),
            T.StructField("cosine", T.DoubleType(), True),
            T.StructField("cent_sim_a", T.DoubleType(), True),
            T.StructField("cent_sim_b", T.DoubleType(), True),
        ]
    )
    empty = pd.DataFrame(
        {
            "id_a": [],
            "id_b": [],
            "cosine": [],
            "cent_sim_a": [],
            "cent_sim_b": [],
        }
    )

    def score(key, pdf):
        cell, blk_a, blk_b = key
        cent = centroids[cell]
        cn = cent_norm[cell]

        def cent_sim(mat):
            return seq_dot_matrix(mat, cent[None, :])[:, 0] / (
                seq_norm(mat) * cn
            )

        rows_a = pdf[pdf["__blk"] == blk_a]
        if len(rows_a) == 0:
            return empty
        # Sort by id so triangular indices (and therefore fold order)
        # are row-order independent.
        rows_a = rows_a.sort_values("id").reset_index(drop=True)
        mat_a = _as_matrix(rows_a["vec"])
        ids_a = rows_a["id"].to_numpy()
        sim_a = cent_sim(mat_a)
        if blk_a == blk_b:
            if len(rows_a) < 2:
                return empty
            cos = seq_dot_matrix(mat_a, mat_a) / (
                seq_norm(mat_a)[:, None] * seq_norm(mat_a)[None, :]
            )
            ia, ib = np.triu_indices(len(ids_a), k=1)
            keep = cos[ia, ib] >= threshold
            ia, ib = ia[keep], ib[keep]
            lo, hi = ids_a[ia], ids_a[ib]
            sl, sh = sim_a[ia], sim_a[ib]
            vals = cos[ia, ib]
        else:
            rows_b = pdf[pdf["__blk"] == blk_b]
            if len(rows_b) == 0:
                return empty
            rows_b = rows_b.sort_values("id").reset_index(drop=True)
            mat_b = _as_matrix(rows_b["vec"])
            ids_b = rows_b["id"].to_numpy()
            sim_b = cent_sim(mat_b)
            cos = seq_dot_matrix(mat_a, mat_b) / (
                seq_norm(mat_a)[:, None] * seq_norm(mat_b)[None, :]
            )
            ia, ib = np.nonzero(cos >= threshold)
            xa, xb = ids_a[ia], ids_b[ib]
            swap = xa > xb
            lo = np.where(swap, xb, xa)
            hi = np.where(swap, xa, xb)
            sl = np.where(swap, sim_b[ib], sim_a[ia])
            sh = np.where(swap, sim_a[ia], sim_b[ib])
            vals = cos[ia, ib]
        return pd.DataFrame(
            {
                "id_a": lo,
                "id_b": hi,
                "cosine": vals,
                "cent_sim_a": sl,
                "cent_sim_b": sh,
            }
        ).sort_values(["id_a", "id_b"])

    return routed.groupBy("cell", "pa", "pb").applyInPandas(
        score, out_schema
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    keep: str = "outlier",
    index=None,
    n_centroids: Optional[int] = None,
    seed: int = 42,
    n_blocks: int = 1,
) -> DataFrame:
    """One-call SemDeDup: ``df`` minus within-cluster semantic duplicates.

    Duplicate groups are connected components over the
    :func:`semantic_dedup_pairs` graph; one representative survives per
    group, chosen by ``keep``:

    * ``"outlier"`` (paper default) — the member with the LOWEST cosine
      similarity to its cluster centroid (ties → lowest id);
    * ``"central"`` — highest centroid similarity (ties → lowest id);
    * ``"min_id"`` — lowest id (fully metric-independent, matches
      ``dedup_corpus``'s rule).

    Scale shape: pairs are within-cell only (never a global cross
    product), components run on the pruned pair list, and the drop set —
    sized by the duplicate count, not the corpus — comes back as a LEFT
    ANTI join, broadcastable in the common case.
    """
    if keep not in ("outlier", "central", "min_id"):
        raise ValueError(
            f"keep must be 'outlier', 'central' or 'min_id', got {keep!r}"
        )

    from patito_spark.operators.graph import connected_components

    with cache_scope():
        pairs = semantic_dedup_pairs(
            df,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            index=index,
            n_centroids=n_centroids,
            seed=seed,
            n_blocks=n_blocks,
        )
        if keep == "min_id":
            components = connected_components(
                pairs, id_a="id_a", id_b="id_b"
            )
            drop = components.filter(
                F.col("node") != F.col("component")
            ).select(F.col("node").alias(id_col))
            return df.join(drop, on=id_col, how="left_anti")

        # Representative = extreme centroid-similarity member. Every node
        # of every component appears in ≥1 pair by construction, so the
        # pair endpoints cover all candidate nodes (duplicates only —
        # this frame is sized by the duplicate count, not the corpus).
        # tracked_persist, NOT raw persist: cache_scope only releases
        # tracked handles on exit — a raw persist here would outlive
        # the call.
        from patito_spark.functions.cache import tracked_persist

        pairs = tracked_persist(pairs)
        node_sims = (
            pairs.select(
                F.col("id_a").alias("node"),
                F.col("cent_sim_a").alias("cent_sim"),
            )
            .unionByName(
                pairs.select(
                    F.col("id_b").alias("node"),
                    F.col("cent_sim_b").alias("cent_sim"),
                )
            )
            .groupBy("node")
            # cent_sim is deterministic per node; min() just collapses
            # the multi-pair repetition.
            .agg(F.min("cent_sim").alias("cent_sim"))
            # Eager lineage cut (like the component label loop): the
            # caller materializes the anti-join AFTER cache_scope drops
            # the pairs cache — without this the scoring pipeline would
            # silently run a second time. Stays distributed; no driver
            # transfer.
            .localCheckpoint(eager=True)
        )
        components = connected_components(pairs, id_a="id_a", id_b="id_b")
        # Representative per component via a MERGEABLE min-struct
        # aggregate, not a row_number window: the drop-all-but-one
        # filter (rk > 1) is not WindowGroupLimit-eligible, so a
        # mega-component (thousands of near-identical docs) would sort
        # whole inside one unsplittable window partition. min(struct)
        # combines map-side; "central" keeps the HIGHEST cent_sim by
        # minimizing its negation (ties fall to node asc either way —
        # the window's exact order).
        # Degenerate cent_sim (a zero-norm CENTROID divides 0/0) reaches
        # here as NULL — pandas' null sentinel IS NaN, so the Arrow
        # boundary converts — or as a genuine NaN on any non-Arrow path.
        # The old row_number windows placed both deterministically
        # (`cent_sim DESC`: NaN first, NULL last; ASC: NULL first, NaN
        # last); a bare min(-cent_sim) silently flips NaN for "central"
        # (NaN stays largest under negation) and a NULL struct field
        # sorts FIRST in min(), flipping NULL too. An explicit rank
        # field pins the windows' exact placement for both spellings.
        c = F.col("cent_sim")
        if keep == "outlier":
            nan_rank = (
                F.when(c.isNull(), F.lit(0))
                .when(F.isnan(c), F.lit(2))
                .otherwise(F.lit(1))
            )
            sort_key = c
        else:
            nan_rank = (
                F.when(F.isnan(c), F.lit(0))
                .when(c.isNull(), F.lit(2))
                .otherwise(F.lit(1))
            )
            sort_key = -c
        joined = components.join(node_sims, on="node")
        rep = (
            joined.groupBy("component")
            .agg(
                F.min(
                    F.struct(
                        nan_rank.alias("r"), sort_key.alias("s"), F.col("node")
                    )
                ).alias("__f")
            )
            .select("component", F.col("__f.node").alias("__rep"))
        )
        drop = (
            joined.join(rep, on="component")
            .filter(F.col("node") != F.col("__rep"))
            .select(F.col("node").alias(id_col))
        )
    # Both inputs of `drop` are materialized (checkpointed) — the anti
    # join below recomputes nothing; its build side is the duplicate
    # count, broadcastable in the common case.
    return df.join(drop, on=id_col, how="left_anti")
