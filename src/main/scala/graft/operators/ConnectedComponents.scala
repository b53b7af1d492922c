package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Min-label-propagation connected components WITH POINTER DOUBLING —
  * the shared clustering engine behind `dedup_cluster_reps` (lexical
  * near-dup graph), `sim_cluster_reps` (semantic near-dup graph),
  * `dedup_semantic`, `dedup_curation_funnel`, `samp_group_split`,
  * `samp_dedup_aware` and `graph_component_census`.
  *
  * Each round every node takes the minimum label among itself and its
  * neighbors, then additionally follows its label's own label
  * (lab ← lab(lab)), so the propagation distance doubles per round and
  * convergence is O(log diameter) rather than O(diameter) — 16 rounds
  * cover components of diameter 65k+. If the loop still hasn't reached
  * fixpoint it THROWS instead of returning silently-wrong labels (a
  * chain-shaped family at 100 TB must fail loudly, not mis-cluster).
  *
  * r20 optimization pass (guide §1.2 "the distributed algorithm" and
  * §2.4 "remove shuffles outright" — fewer jobs, fewer exchanges per
  * round; measured on dedup_semantic at sf0.1: 10 rounds × ~0.31 s =
  * 3.1 s of the query's 4.1 s before the pass):
  *
  *  1. ALIGNED PARTITIONING: the symmetric edge list is keyed by dst
  *     ONCE (session shuffle-partition count — scale-adaptive, the
  *     bench sets it to the core count and a cluster to its width),
  *     so the per-round neighbor join reads it co-partitioned instead
  *     of re-shuffling the full edge list every round; the aggregate's
  *     output partitioning then matches the label frame's, removing
  *     the old loop's two hard-coded `repartition(4)` exchanges per
  *     round.
  *  2. OBSERVE-BASED CONVERGENCE: the changed-row count rides the
  *     round's checkpoint materialization as a CollectMetrics
  *     observation instead of a separate full-scan aggregate job —
  *     one job fewer per round, identical decision.
  *  3. STATS RESET at every checkpoint (graftbridge.dropStats):
  *     `localCheckpoint` carries the origin plan's ESTIMATED stats
  *     into the new LogicalRDD, and Catalyst's size-only join
  *     estimator multiplies child sizes — so the estimate compounds
  *     geometrically across rounds and the driver ends up burning
  *     seconds in BigInteger.multiply during planning (jstack-verified
  *     on a double-jump experiment: 38 s in round 10, all in
  *     multiplyToomCook3 under SizeInBytesOnlyStatsPlanVisitor).
  *     Fresh LogicalRDDs keep every round's planning O(plan), and AQE
  *     picks join strategies from runtime sizes — the correct source
  *     on a cluster too.
  *
  *  A double-jump variant (two pointer jumps per round) was measured
  *  and REJECTED: on the gate graphs it reduced zero rounds
  *  (dedup_semantic 10→10, sim_cluster_reps 5→5 — the round count is
  *  governed by the neighbor-min frontier on these chain-shaped
  *  families, not by pointer depth) while paying one extra label-sized
  *  self-join + checkpoint per round.
  *
  * Iteration state rides eager `localCheckpoint`, not `cache()`: a
  * checkpoint truncates the lineage so every round's plan is two joins
  * over materialized blocks, where cache() left the full multi-round
  * DAG in the plan (measured 4–6 s/round at sf0.1; ~0.3 s
  * checkpointed). The loop runs only over the ACTIVE vertex set (nodes
  * with ≥1 edge) — isolated nodes are their own component and rejoin
  * in the caller. Loop state partitioning is explicit (never by
  * mutating the session-global shuffle-partition conf — a concurrent
  * query must not observe a temporary value).
  */
object ConnectedComponents {
  private def pin(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.dropStats(df.localCheckpoint())

  /** Labels for every ACTIVE vertex of the undirected pair list
    * `pairs` (two columns: endpoint a, endpoint b — one row per
    * unordered edge). Returns (id, lab) with lab = the component's
    * minimum vertex id. */
  def labels(s: SparkSession, pairs: DataFrame, caller: String): DataFrame = {
    import s.implicits._
    val Seq(c1, c2) = pairs.columns.toSeq.map(col)
    val loopParts = s.sessionState.conf.numShufflePartitions
    // one pass over the pair stream, each pair exploded to both edge
    // directions, so a single checkpoint job materializes the
    // symmetric edge list (a union of pairs with its swap would either
    // evaluate the pair join twice or need its own barrier). Keyed by
    // dst ONCE: every round's neighbor join reads it co-partitioned.
    val edges = pin(pairs
      .select(explode(array(
        struct(c1.as("src"), c2.as("dst")),
        struct(c2.as("src"), c1.as("dst")))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst"))
      .repartition(loopParts, $"dst"))
    // distinct over the dst-keyed frame needs no exchange; the active
    // vertex set IS the dst set (the edge list is symmetric)
    var labels = pin(edges.select($"dst".as("id")).distinct()
      .select($"id", $"id".as("lab")))
    var changed = true
    var iter = 0
    val maxRounds = 16
    while (changed && iter < maxRounds) {
      val tR = System.nanoTime()
      // dst-keyed edges ⋈ id-keyed labels: co-partitioned; the
      // groupBy(src) is the sub-step's one propagation shuffle,
      // emitting an id-keyed frame again. TWO neighbor-min sub-steps
      // per round (the frontier advances one hop per sub-step on these
      // chain-shaped gate graphs — the jump alone measured no round
      // reduction), so the round count halves for one extra edge-sized
      // join inside the same job.
      def nbrStep(l: DataFrame): DataFrame = {
        val nbrMin = edges
          .join(l.select($"id".as("dst2"), $"lab".as("nl")), $"dst" === $"dst2")
          .groupBy($"src".as("id")).agg(min($"nl").as("nlab"))
        l.join(nbrMin, Seq("id"), "left")
          .select($"id",
            least($"lab", coalesce($"nlab", $"lab")).as("lab"), $"old")
      }
      // ESCALATION: most gate graphs converge in ≤2 rounds (near-dup
      // clusters are shallow) — give them the cheapest possible round;
      // a graph still changing after two rounds has a deep component,
      // so later rounds double the frontier advance per round.
      val l0 = labels.withColumn("old", $"lab")
      val half = if (iter < 2) nbrStep(l0) else nbrStep(nbrStep(l0))
      // pointer doubling: follow the new label's own new label.
      // Labels are always ids of same-component vertices, so the
      // lookup stays within the component; least() is monotone.
      // The convergence flag rides the SAME job that materializes the
      // round result (CollectMetrics observation) — no separate
      // full-scan aggregate job per round.
      val obs = new Observation(s"cc_${caller}_$iter")
      val next = pin(half.as("x")
        .join(half.select($"id".as("pk"), $"lab".as("plab")).as("y"),
          col("x.lab") === col("y.pk"), "left")
        .select(col("x.id").as("id"),
          least(col("x.lab"), coalesce(col("plab"), col("x.lab"))).as("lab"),
          col("x.old").as("old"))
        .observe(obs, sum(when($"lab" =!= $"old", 1L).otherwise(0L)).as("n_changed")))
      // sum() over an empty frame observes NULL — treat as converged
      changed = obs.get.get("n_changed") match {
        case Some(v: java.lang.Long) => v.longValue() > 0L
        case _ => false
      }
      labels = next.select($"id", $"lab")
      iter += 1
      if (sys.env.contains("GRAFT_DEBUG"))
        System.err.println(f"[cc] round $iter: ${(System.nanoTime() - tR) / 1e9}%.2f s changed=$changed")
    }
    if (changed)
      throw new IllegalStateException(
        s"$caller: connected components did not converge in $maxRounds " +
          "pointer-doubling rounds (component diameter > 2^" + maxRounds + ") — refusing " +
          "to return unconverged cluster labels")
    labels
  }
}
