"""Connected components over an edge list — the dedup pipeline's last
mile: near-dup PAIRS (minhash/simhash/phash/embedding) become CLUSTERS,
and each cluster elects a canonical keeper (its min-id member), which is
what a training-data dedup job actually deletes against.

No reference analog (GeoMesa emits pairs only); the algorithm family is
published: Kiveris et al., "Connected Components in MapReduce and
Beyond" (SoCC'14). This is the min-label-propagation + pointer-jumping
(path-halving) member of that family:

- every node starts labeled with itself,
- each round a node takes the min label among itself and its neighbors
  (one shuffle on the edge key),
- then labels jump to their label's label (one self-join) — the
  path-halving step that turns O(diameter) convergence into O(log n),
- stop when no label changed.

Scale shape: each round is two shuffles over |E| + |V| rows; rounds are
localCheckpointed (lineage truncation, blocks reclaimed on GC) and the
loop is driver-bounded with one tiny count() action per round — the
same iterate-with-checkpoint discipline as operators/knn.py. Near-dup
graphs have tiny components (bounded diameter), so rounds ~ 3-5 in
practice; the pointer jump bounds pathological chains at O(log n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, *, a: str = "a", b: str = "b",
                         max_iter: int = 50) -> DataFrame:
    """(node, comp) for every node appearing in ``edges`` — ``comp`` is
    the component's minimum node id (by the column's natural ordering),
    i.e. the canonical keeper of a dedup cluster.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence: partially-merged labels would make a downstream dedup
    elect multiple keepers per true cluster and delete against wrong
    canonical ids — with pointer jumping, non-convergence within
    O(log n) rounds means max_iter is badly undersized, never a state
    worth silently returning."""
    # LAZY checkpoints throughout: each round's convergence count() is
    # then the round's ONLY job (it materializes that round's checkpoint
    # as a side effect) — eager checkpoints would triple the action count
    # and the wall is action-scheduling-bound, not data-bound
    und = edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
    und = und.union(und.select(F.col("y").alias("x"),
                               F.col("x").alias("y"))) \
        .localCheckpoint(eager=False)
    labels = (und.select(F.col("x").alias("node")).distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint(eager=False))
    for _ in range(max_iter):
        nb = (und.join(labels.withColumnRenamed("node", "y"), "y")
              .groupBy(F.col("x").alias("node"))
              .agg(F.min("comp").alias("nb_comp")))
        # carry the pre-step label as `old` so the convergence check is a
        # row-local compare on `jumped` instead of a labels re-join — one
        # fewer shuffle per round on a loop whose wall is round-job count
        stepped = (labels.join(nb, "node", "left")
                   .select("node",
                           F.col("comp").alias("old"),
                           F.least(F.col("comp"),
                                   F.coalesce("nb_comp", F.col("comp")))
                           .alias("comp")))
        # pointer jump: comp <- comp(comp); label values are node ids,
        # so the lookup table is `stepped` itself
        parent = stepped.select(F.col("node").alias("comp"),
                                F.col("comp").alias("pcomp"))
        jumped = (stepped.join(parent, "comp", "left")
                  .select("node", "old",
                          F.coalesce("pcomp", F.col("comp")).alias("comp"))
                  .localCheckpoint(eager=False))
        changed = jumped.where(F.col("old") != F.col("comp")).count()
        labels = jumped.select("node", "comp")
        if changed == 0:
            return labels
    last = changed if max_iter > 0 else "n/a (no rounds ran)"
    raise RuntimeError(
        f"connected_components did not converge within {max_iter} rounds "
        f"(last round changed {last} labels); raise max_iter")


def dedup_clusters(edges: DataFrame, *, a: str = "a", b: str = "b",
                   max_iter: int = 50) -> DataFrame:
    """Cluster summary from near-dup pairs: one row per component with
    its canonical keeper (min member id) and member count — the frame a
    dedup job anti-joins against to drop everything but the keeper."""
    cc = connected_components(edges, a=a, b=b, max_iter=max_iter)
    return (cc.groupBy(F.col("comp").alias("keeper"))
            .agg(F.count("*").alias("n_members")))
