package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup detection yields PAIRS
  * (a, b); deduplication needs CLUSTERS — the connected components of
  * the pair graph — so one survivor can represent each group of
  * mutual near-duplicates (a~b, b~c ⇒ {a,b,c} keep min id).
  *
  * Algorithm: label propagation with POINTER DOUBLING: every node
  * starts labeled with itself; each round every node adopts the min
  * label over its neighborhood AND then the label of its label
  * (label-of-label join), which squares the propagation distance per
  * round → O(log diameter) rounds instead of O(diameter). `iters` = 6
  * covers diameter 2⁶; convergence is checked and iteration stops
  * early when a round changes nothing.
  *
  * Scale shape: each round is one join on the edge list + one
  * groupBy(min) — both shuffle on the node id, no driver-side graph.
  * Edge lists from LSH candidates are O(docs·bands), not O(docs²).
  */
object DedupCluster {

  /** @param pairs edge list with two id columns (a, b)
    * @param checkConvergence false = run exactly `iters` rounds with NO
    *        per-round convergence `count()` — a caller that knows its
    *        diameter bound (LSH cluster diameters are tiny; round count
    *        is log₂ of it) drops 6 driver actions to 1 and lets the
    *        whole chain stay lazy between checkpoints
    * @return (id, cluster) — cluster = min node id reachable; only
    *         ids appearing in `pairs` are returned (singletons keep
    *         themselves implicitly) */
  def clusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
               iters: Int = 6, checkConvergence: Boolean = true): DataFrame = {
    val spark = pairs.sparkSession
    // undirected edges, both directions
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .cache()
    // seed = one plain propagation round for free: label(u) = min(u,
    // min neighbor) off the edge list directly (one agg, no join) —
    // near-clique components (the dedup norm) converge in the seed and
    // pay only the single confirming round
    var labels = edges.groupBy("u").agg(min("v").as("mv"))
      .select(col("u").as("id"), least(col("u"), col("mv")).as("lbl"))
    var changed = true
    var round = 0
    while (changed && round < iters) {
      // each node adopts min(own label, neighbors' labels)
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "v"), Seq("v"))
        .select(col("u").as("id"), col("lbl"))
      // pointer doubling: also adopt the label OF the label (every
      // label is itself a node id, so the lookup always resolves).
      // Doubling runs off the CURRENT labels — independent of the
      // edge-hop join, so both shuffles run concurrently and the round
      // needs ONE groupBy, not two (3 shuffle stages/round vs 4).
      // Reach still ≥ doubles per round: R' = max(R+1, 2R).
      val viaLabel = labels
        .join(labels.select(col("id").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"))
        .select(col("id"), col("lbl2").as("lbl"))
      // checkpoint per round: the doubling join references `labels`
      // twice, so an unbroken lineage would DOUBLE the plan tree every
      // round (exponential analysis cost); localCheckpoint truncates it.
      // Lazy in fixed-rounds mode (no action until the caller's one),
      // eager when the convergence count() follows anyway.
      val next = labels.unionByName(viaEdges).unionByName(viaLabel)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(eager = checkConvergence)
      changed = !checkConvergence ||
        next.join(labels.withColumnRenamed("lbl", "old"), Seq("id"))
          .filter(col("lbl") =!= col("old")).limit(1).count() > 0
      labels = next
      round += 1
    }
    labels.select(col("id"), col("lbl").as("cluster"))
  }

  /** Survivor filter: documents whose id is NOT a non-representative
    * member of any cluster (keep-min policy). */
  def survivors(docs: DataFrame, idCol: String, pairs: DataFrame,
                aCol: String = "a", bCol: String = "b",
                iters: Int = 6, checkConvergence: Boolean = true): DataFrame = {
    val cl = clusters(pairs, aCol, bCol, iters, checkConvergence)
    val losers = cl.filter(col("id") =!= col("cluster")).select(col("id"))
    docs.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }
}
