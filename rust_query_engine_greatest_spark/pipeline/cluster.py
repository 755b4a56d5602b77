"""Connected-components clustering of near-duplicate pairs.

Pair generators (exact/Jaccard/MinHash/SimHash/embedding — dedup.py)
emit EDGES; deduplicating a corpus needs the transitive closure of
those edges: groups, then one canonical keeper per group. This is the
standard final stage of a web-scale dedup pipeline (the reference's
scope ends at pairwise similarity — see
`datafusion-greatest/datafusion/functions/src/core/greatest.rs` for its
comparison-kernel focus — so this stage is part of the repo's
beyond-reference LLM-pipeline surface).

Algorithm: iterative min-label propagation to a fixpoint.  Each node
starts labeled with its own id; every iteration each node takes the min
label over itself and its neighbors.  Converges in O(max component
diameter) iterations; near-dup clusters are dense (template families,
boilerplate cliques), so the diameter is small — 3-5 iterations in
practice.  Each iteration is two hash exchanges over NARROW (id, label)
rows: one join of the cached symmetric edge list against the current
labels, one min-groupBy.  The edge list is shuffled to its join
partitioning ONCE and persisted; only the (id, label) frame moves per
iteration.

At 100 TB: label frames are two longs per node — orders of magnitude
smaller than the corpus; the driver loop adds one count() action per
iteration (the convergence test) which AQE answers from shuffle
statistics.  Lineage is cut with localCheckpoint every iteration (a
reliable checkpoint dir is the cluster-mode equivalent).  For adversarial
high-diameter graphs (long chains), the known O(log n)-round refinement
is large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014); dedup graphs do not need it, and the
per-round cost here is strictly lower (no degree blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in `pairs`, where
    component = min node id in the node's connected component.

    Raises RuntimeError if the fixpoint is not reached in `max_iter`
    rounds (diameter > max_iter ⇒ the input is not a dedup-shaped
    graph; use a log-round scheme instead of raising the cap).
    """
    e = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # One shuffle to the join key, then reused every iteration.
    edges = edges.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "comp"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"), "id")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select("id", F.col("comp").alias("component"))
    edges.unpersist()
    raise RuntimeError(
        f"connected_components: no fixpoint within {max_iter} iterations "
        "(graph diameter too large for label propagation)"
    )


def keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Corpus-level dedup: drop every document whose component has a
    smaller-id member; singletons (no near-dup pair) survive untouched.

    One extra shuffle beyond connected_components: the anti-join of the
    corpus against the (small) non-canonical id list — which Spark
    plans as a broadcast anti-join whenever the duplicate set fits,
    i.e. exactly when dedup is worth running.
    """
    comp = connected_components(pairs, id_a="id_a", id_b="id_b")
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
