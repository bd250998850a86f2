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
* One Spark action per TWO rounds (round-6 trim): pointer jumping
  converges in ~log2(diameter)+1 rounds, so checking convergence only on
  alternate rounds halves the driver's action/scheduling floor at the
  cost of at most one extra round of (cheap, already-converged) work.
  The label sum is monotone non-increasing per round, so "sum unchanged
  across two rounds" remains an exact convergence proof.  The odd round's
  table is localCheckpoint-marked but not separately actioned — the even
  round's job materializes it in passing.
* Lineage is truncated EVERY round via ``localCheckpoint``: each round
  references the previous label table twice (propagation join + jump
  join), so an un-truncated logical plan DOUBLES per round — exponential
  tree growth that OOMs the driver around round 7-8 (observed: AQE's
  generateTreeString heap blowup).  The checkpoint stores the round's
  label partitions (same bytes a persist would hold) and resets the plan
  to a leaf.  Superseded rounds' blocks are freed EAGERLY each iteration
  (round-5 review ask: waiting for the ContextCleaner lets up to
  max_rounds stale label tables accumulate on a long-lived session) —
  only the final table's blocks stay alive, released by the
  ContextCleaner when the caller drops the returned DataFrame.
* Non-convergence RAISES instead of returning silently-wrong labels
  (a round-4 review finding: a silent iteration cap on a correctness-gated
  operator).  With doubling, ``max_rounds=50`` covers any graph a real
  machine can hold (diameter ≈ 2^50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def free_checkpoint_blocks(df: DataFrame) -> None:
    """Eagerly drop the storage blocks behind a ``localCheckpoint``-ed
    DataFrame.  ONLY call on a table that will never be referenced again —
    the blocks are the data (recompute is impossible after this).  Without
    it the blocks linger until the JVM-side RDD is garbage-collected and
    the ContextCleaner runs."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # best-effort: a non-LogicalRDD plan has nothing to free


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
    where a pairless doc is its own group).  The result is backed by a
    ``localCheckpoint`` — materialized, lineage-free; its blocks are
    released when the caller drops the reference.

    Raises RuntimeError if the labels have not provably converged within
    ``max_rounds`` rounds.
    """
    edges = (pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
             .unionByName(
                 pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
             .persist())
    labels = (edges.select(F.col("a").alias("id")).distinct()
              .withColumn("label", F.col("id")).persist())
    seed_labels = labels  # the setup frame, unpersisted after round 0

    def one_round(lab: DataFrame) -> DataFrame:
        # propagate: every node takes min(own, neighbors') previous label
        prop = (edges.join(lab, edges["b"] == lab["id"])
                .select(F.col("a").alias("id"), "label"))
        new = (lab.unionByName(prop)
               .groupBy("id").agg(F.min("label").alias("label")))
        # pointer jump through the previous table: label := prev[label].
        # prev[x] <= x for every x (labels start at id, only decrease), so
        # the jump only improves; label values are node ids, so the lookup
        # always matches (coalesce is belt-and-braces for the left join).
        prevmap = lab.select(F.col("id").alias("jid"),
                             F.col("label").alias("jlabel"))
        new = (new.join(prevmap, new["label"] == prevmap["jid"], "left")
               .select("id", F.coalesce("jlabel", "label").alias("label")))
        # truncate lineage + mark this round's partitions for storage; the
        # next action to touch the frame materializes it
        return new.localCheckpoint(eager=False)

    sentinel = object()
    prev_sum = sentinel
    converged = False
    rounds_run = 0
    while rounds_run < max_rounds:
        stale = [labels]  # superseded tables to free after this stride
        mid = None
        if rounds_run + 1 < max_rounds:  # two rounds, ONE action
            mid = one_round(labels)
            stale.append(mid)
            new = one_round(mid)
            rounds_run += 2
        else:  # odd max_rounds tail
            new = one_round(labels)
            rounds_run += 1
        obs = Observation()
        # decimal(38,0): exact at any node count (no int64 overflow, no FP)
        (new.observe(obs, F.sum(F.col("label").cast("decimal(38,0)"))
                     .alias("s"))
            .count())  # the stride's ONE action: materializes mid + new + obs
        if seed_labels is not None:
            seed_labels.unpersist()  # the distinct-ids frame from setup
            seed_labels = None
            stale = stale[1:]  # it was `labels`; persist-freed above instead
        for df in stale:
            free_checkpoint_blocks(df)
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
