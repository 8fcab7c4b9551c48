package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup detection yields PAIRS
  * (a, b); deduplication needs CLUSTERS — the connected components of
  * the pair graph — so one survivor can represent each group of
  * mutual near-duplicates (a~b, b~c ⇒ {a,b,c} keep min id).
  *
  * Algorithm: label propagation, accelerated by a label-of-label jump:
  * every node starts labeled with itself; each round every node adopts
  * the min label over its neighborhood AND the label of its current
  * label. The jump usually collapses chains geometrically, but its
  * GUARANTEED progress is only one hop per round — a node's label can
  * be a low-id pendant whose own ball is small, so L(L(u)) adds
  * nothing in the worst case. Correctness therefore comes from the
  * convergence loop, not a round-count heuristic: rounds continue
  * until a round changes no label. The convergence test is an O(1)
  * label-sum fingerprint (exact — see the inline proof), so a
  * checking round costs one eager checkpoint plus a cached scan, not
  * a shuffle join. `minRounds` keeps the first k rounds fully lazy
  * (no driver action, lineage truncated by lazy localCheckpoints) for
  * callers that can bound the diameter below; with the cheap test the
  * knob matters far less than it did when each check was a join.
  *
  * Scale shape: each round is one join on the edge list + one
  * groupBy(min) — both shuffle on the node id, no driver-side graph.
  * Edge lists from LSH candidates are O(docs·bands), not O(docs²).
  */
object DedupCluster {

  /** @param pairs edge list with two id columns (a, b)
    * @param iters hard round cap (safety net; convergence normally
    *        exits long before — hop-min alone covers any diameter ≤
    *        iters, so the cap only binds on pathological graphs)
    * @param checkConvergence false = run exactly `iters` rounds with
    *        NO convergence action at all — only for callers that can
    *        PROVE their diameter bound; the declared queries use the
    *        minRounds hybrid instead
    * @param minRounds first k rounds run lazily without the
    *        convergence count() (k = the expected-diameter budget;
    *        the first check then usually confirms stability at one
    *        driver action total)
    * @return (id, cluster) — cluster = min node id reachable; only
    *         ids appearing in `pairs` are returned (singletons keep
    *         themselves implicitly) */
  def clusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
               iters: Int = 6, checkConvergence: Boolean = true,
               minRounds: Int = 0): DataFrame = {
    // undirected edges, both directions
    // DISK-memoized (round 14 — was .cache()): every propagation round
    // re-reads the edge set, and an evicted cache re-paid the caller's
    // whole pair pipeline once per round under memory pressure (the
    // r12 disease class); a file read cannot be evicted.
    val edges = graft.core.DiskMemo.persist(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"))
        .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
        .distinct(),
      "dc_edges")
    // seed = one plain propagation round for free: label(u) = min(u,
    // min neighbor) off the edge list directly (one agg, no join) —
    // near-clique components (the dedup norm) converge in the seed and
    // pay only the single confirming round
    var labels = edges.groupBy("u").agg(min("v").as("mv"))
      .select(col("u").as("id"), least(col("u"), col("mv")).as("lbl"))
    // Convergence fingerprint: labels are MONOTONICALLY non-increasing
    // per id (every round takes a min over a set containing the current
    // label) and the id set is fixed after the seed (always exactly the
    // node set of `edges`), so sum(lbl) strictly decreases iff ANY
    // label changed. Comparing the sum between rounds is therefore an
    // EXACT convergence test — no hash, no collision risk — and costs
    // one in-memory scan of the just-checkpointed frame instead of the
    // shuffle join-and-diff it replaces (the round-10 perf regression).
    // decimal(38,0) keeps the sum exact far beyond any corpus size
    // (38 digits ≫ 19-digit max-int64 label × any realistic row count).
    def fingerprint(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0))
    var prevFp: Option[Option[java.math.BigDecimal]] = None
    var changed = true
    var round = 0
    while (changed && round < iters) {
      val checking = checkConvergence && round >= minRounds
      // each node adopts min(own label, neighbors' labels) — the
      // guaranteed +1-hop step
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "v"), Seq("v"))
        .select(col("u").as("id"), col("lbl"))
      // label-of-label jump (every label is itself a node id, so the
      // lookup always resolves): runs off the CURRENT labels —
      // independent of the edge-hop join, so both shuffles run
      // concurrently and the round needs ONE groupBy, not two. The
      // jump is an ACCELERATOR (usually geometric), not the
      // correctness argument — see the scaladoc.
      val viaLabel = labels
        .join(labels.select(col("id").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"))
        .select(col("id"), col("lbl2").as("lbl"))
      // checkpoint per round: the doubling join references `labels`
      // twice, so an unbroken lineage would DOUBLE the plan tree every
      // round (exponential analysis cost); localCheckpoint truncates it.
      // Lazy while no convergence action follows, eager when one does.
      val next = labels.unionByName(viaEdges).unionByName(viaLabel)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(eager = checking)
      if (checking) {
        // materializing `next` above also materialized every lazy
        // checkpoint in its lineage, so the prior round's fingerprint
        // (first checking round only) is a cached scan, not a re-run
        val pf = prevFp.getOrElse(fingerprint(labels))
        val fp = fingerprint(next)
        changed = fp != pf
        prevFp = Some(fp)
      }
      labels = next
      round += 1
    }
    labels.select(col("id"), col("lbl").as("cluster"))
  }

  /** Survivor filter: documents whose id is NOT a non-representative
    * member of any cluster (keep-min policy). */
  def survivors(docs: DataFrame, idCol: String, pairs: DataFrame,
                aCol: String = "a", bCol: String = "b",
                iters: Int = 6, checkConvergence: Boolean = true,
                minRounds: Int = 0): DataFrame = {
    val cl = clusters(pairs, aCol, bCol, iters, checkConvergence, minRounds)
    val losers = cl.filter(col("id") =!= col("cluster")).select(col("id"))
    docs.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }
}
