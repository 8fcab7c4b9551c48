package graft.vec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over the embedding column — the
  * learned-centroid counterpart of the analytic sign-bit quantizer in
  * [[VecOps]] (a real IVF index trains exactly this way: k-means the
  * corpus, partition by nearest centroid, search only the query's
  * cells).
  *
  * Determinism: init = the k lowest vec_ids (no RNG — SURVEY §2.0.6
  * bans randomness), iteration count fixed. Each iteration is one
  * broadcast of k centroids + one groupBy — no driver-side loops over
  * data, only over the k centroids, so the shape holds at any corpus
  * size: the per-iteration cost is a single map + partial/final
  * aggregation over (cluster, dim-sums).
  *
  * Iterative refinement has no SQL oracle (out of the batch gate's
  * scope — SURVEY §2.J capability row); KMeansSpec asserts the
  * invariants instead: assignment validity, monotone non-increasing
  * inertia, determinism across partitionings.
  */
object KMeans {

  /** @return (assignments: vec_id → cluster, centroids, inertia) */
  def fit(embeddings: DataFrame, k: Int, iters: Int): (DataFrame, Array[Array[Double]], Double) = {
    val spark = embeddings.sparkSession
    val vecs = embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
    val dim = vecs.select(size(col("e"))).head().getInt(0)

    // deterministic seed: the k lowest vec_ids
    var centroids: Array[Array[Double]] = vecs.orderBy("vec_id").limit(k)
      .select("e").collect()
      .map(_.getSeq[Double](0).toArray)

    def assignExpr(cs: Array[Array[Double]]) = {
      // nearest centroid by squared L2, ties to the lower cluster id
      val dists = cs.zipWithIndex.map { case (c, i) =>
        val lit = s"array(${c.mkString(",")})"
        struct(
          expr(s"aggregate(zip_with(e, $lit, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)")
            .as("d"),
          org.apache.spark.sql.functions.lit(i).as("c"))
      }
      array_min(array(dists: _*))
    }

    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = vecs.withColumn("a", assignExpr(centroids))
        .select(col("vec_id"), col("e"), col("a.c").as("cluster"), col("a.d").as("dist"))
      // element-wise mean per cluster: explode dims, re-assemble.
      // The sum is taken over decimal(38,18) — exact and therefore
      // ORDER-INDEPENDENT, unlike double accumulation whose result
      // depends on partitioning; one cast back to double at the end
      // keeps centroids bit-identical across any repartitioning.
      val newCs = assigned
        .select(col("cluster"), posexplode(col("e")).as(Seq("i", "x")))
        .groupBy("cluster", "i")
        .agg((sum(col("x").cast("decimal(38,18)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("ms"))
        .select(col("cluster"), expr("transform(ms, s -> s.m)").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      centroids = (0 until k).map(i => newCs.getOrElse(i, centroids(i))).toArray
    }
    val finalAssigned = vecs.withColumn("a", assignExpr(centroids))
      .select(col("vec_id"), col("a.c").as("cluster"), col("a.d").as("dist"))
    val inertia = finalAssigned.agg(sum("dist")).head().getDouble(0)
    (finalAssigned.select("vec_id", "cluster"), centroids, inertia)
  }
}
