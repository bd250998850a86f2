"""Connected components over a DataFrame pair graph — the grouping step of
the near-dup pipeline (LSH candidate pairs → duplicate clusters).

Algorithm: min-label propagation with pointer-jumping compression.
Each round every node takes the minimum of its own and its neighbors'
labels (one shuffle join + one partial-aggregated groupBy), then jumps
its label through the previous round's label table (one more join against
the cached table).  The jump makes the propagation radius roughly DOUBLE
per round (1, 3, 7, 15, … hops on a path graph) — O(log diameter) rounds,
the same asymptotics as the large-star/small-star alternation
(Kiveris et al., "Connected Components in MapReduce and Beyond") with a
simpler per-round shape.

Scale notes (10^10-node pair graphs):
* No row data ever reaches the driver — the only per-round driver value is
  an Observation carrying an exact decimal label-sum.  Labels start equal
  to node ids and strictly decrease whenever anything changes, so an
  unchanged sum is an exact (not probabilistic) convergence proof, with no
  extra comparison join.
* One Spark action per round (the count that materializes the new label
  table and fires the Observation).
* Lineage is truncated EVERY round via ``localCheckpoint``: each round
  references the previous label table twice (propagation join + jump
  join), so an un-truncated logical plan DOUBLES per round — exponential
  tree growth that OOMs the driver around round 7-8 (observed: AQE's
  generateTreeString heap blowup).  The checkpoint stores the round's
  label partitions (same bytes a persist would hold) and resets the plan
  to a leaf; superseded rounds' blocks are dropped by the ContextCleaner
  when their driver references go out of scope.
* Non-convergence RAISES instead of returning silently-wrong labels
  (a round-4 review finding: a silent iteration cap on a correctness-gated
  operator).  With doubling, ``max_rounds=50`` covers any graph a real
  machine can hold (diameter ≈ 2^50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_rounds: int = 50,
) -> DataFrame:
    """Label each node of the undirected graph ``pairs`` with the minimum
    node id of its connected component.

    ``pairs`` columns ``src``/``dst`` must be a numeric (orderable,
    summable) id type.  Returns DataFrame(id, label) covering every node
    that appears in at least one pair (singletons never enter the graph —
    the caller decides their representation, matching the LSH pipeline
    where a pairless doc is its own group).

    Raises RuntimeError if the labels have not provably converged within
    ``max_rounds`` rounds.
    """
    edges = (pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
             .unionByName(
                 pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
             .persist())
    labels = (edges.select(F.col("a").alias("id")).distinct()
              .withColumn("label", F.col("id")).persist())

    sentinel = object()
    prev_sum = sentinel
    converged = False
    for rnd in range(max_rounds):
        # propagate: every node takes min(own, neighbors') previous label
        prop = (edges.join(labels, edges["b"] == labels["id"])
                .select(F.col("a").alias("id"), "label"))
        new = (labels.unionByName(prop)
               .groupBy("id").agg(F.min("label").alias("label")))
        # pointer jump through the CACHED previous table: label := prev[label].
        # prev[x] <= x for every x (labels start at id, only decrease), so
        # the jump only improves; label values are node ids, so the lookup
        # always matches (coalesce is belt-and-braces for the left join).
        prevmap = labels.select(F.col("id").alias("jid"),
                                F.col("label").alias("jlabel"))
        new = (new.join(prevmap, new["label"] == prevmap["jid"], "left")
               .select("id", F.coalesce("jlabel", "label").alias("label")))
        # truncate lineage + store this round's partitions in one step;
        # the count below materializes it and fires the Observation
        new = new.localCheckpoint(eager=False)
        obs = Observation()
        # decimal(38,0): exact at any node count (no int64 overflow, no FP)
        (new.observe(obs, F.sum(F.col("label").cast("decimal(38,0)"))
                     .alias("s"))
            .count())  # the round's ONE action: materializes cache + obs
        if rnd == 0:
            labels.unpersist()  # the distinct-ids frame from setup
        labels = new
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"(label sum still decreasing: {prev_sum})")
    return labels
