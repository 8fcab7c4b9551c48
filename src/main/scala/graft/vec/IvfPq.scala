package graft.vec

import graft.core.{Tables => T}
import graft.ops.OpSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ — the standard billion-scale ANN index layout (public
  * recipe: Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): the learned coarse quantizer
  * ([[IvfCentroids]], the same k=8 cells the gated IVF queries use)
  * routes each vector to a cell, and PQ encodes the RESIDUAL
  * e − c(cell) — residuals have much smaller norm than raw vectors,
  * so the same 4-bit code budget quantizes with far less error
  * (measured on this corpus: mean ‖r‖² ≈ 0.93·‖e‖², and the
  * reconstruction MSE drop is asserted in IvfPqSpec).
  *
  * Residual codebooks are trained OFFLINE ([[TrainIvfPq]]) and inline
  * into both engines as literals ([[PqResidualCodebooks]]).
  *
  * 100 TB shapes:
  *  - cell assignment is corpus ⨯ broadcast(k centroids) with a
  *    map-side partial min — ONE shuffled row per vector at any k,
  *    and the cell doubles as the IVF partition key;
  *  - residual + encode are row-local after that broadcast;
  *  - ADC search scores only codes: the per-(cell, sub, code) lookup
  *    table is 8×4×16 = 512 tiny rows built from the single query row
  *    and broadcast.
  *
  * All doubles bit-identical by construction (literal round-trip,
  * ordered-fold dots, fixed-order sums) ⇒ outputs UNROUNDED.
  */
object IvfPq {

  private def csqIvf(i: Int): Double = {
    val c = IvfCentroids.centroids(i)
    var s = 0.0; var j = 0
    while (j < c.length) { s += c(j) * c(j); j += 1 }
    s
  }

  /** Literal formatters shared with Pq (same parse-exactness rules). */
  private def fd(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }
  private def listLit(c: Array[Double]): String =
    s"[${c.map(fd).mkString(",")}]::DOUBLE[]"

  /** DuckDB ordered-fold dot of two list expressions. */
  private def fold2(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($a, $b), x -> x[1]*x[2])), (acc, x) -> acc + x)"
  private def foldSq(a: String): String =
    s"list_reduce(list_prepend(0.0, list_transform($a, x -> x*x)), (acc, x) -> acc + x)"

  private val K = IvfCentroids.centroids.length
  private def m = PqResidualCodebooks.m
  private def subDim = PqResidualCodebooks.subDim

  /** (vec_id, label, e, cell, r) — nearest-cell assignment (ties to
    * the lower cid, the gated-IVF device) + residual. One broadcast,
    * one map-side-partial shuffle row per vector. */
  def residuals(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val cells = IvfCentroids.centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, csqIvf(i), c.toSeq) }
      .toDF("cid", "csq", "c")
    emb
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      .crossJoin(broadcast(cells))
      .withColumn("d",
        expr("csq - 2.0D * aggregate(zip_with(e, c, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
      .groupBy("vec_id")
      .agg(min(col("label")).as("label"), min(col("e")).as("e"),
        min(struct(col("d"), col("cid"), col("c"))).as("best"))
      .select(col("vec_id"), col("label"), col("e"),
        col("best.cid").as("cell"),
        expr("zip_with(e, best.c, (x, y) -> x - y)").as("r"))
  }

  /** IVF-PQ encode of a corpus: id ++ (cell, rc0.., qerr).
    * DISK-memoized (round 14): the assignment + residual + m argmin
    * folds run ONCE per corpus; the encode gate and the ADC search
    * read the same codes artifact (persisting the codes IS the
    * production index build). */
  def ivfPqEncodeOf(emb: DataFrame): DataFrame =
    graft.core.DiskMemo.persist(ivfPqEncodeRawOf(emb), "ivfpq_codes")

  /** The un-memoized encode pipeline — the plan IvfPqSpec's shape
    * assertions inspect (the memoized form reads a parquet artifact,
    * hiding the broadcast + partial-shuffle shape behind the write). */
  private[graft] def ivfPqEncodeRawOf(emb: DataFrame): DataFrame = {
    val books = PqResidualCodebooks.codebooks
    Pq.encFrame(residuals(emb), "r", Seq("vec_id", "cell"), books)
      .select((col("vec_id") +: col("cell") +:
        books.indices.map(sub => col(s"c$sub").as(s"rc$sub")) :+
        expr(Pq.qerrExprB(books)).as("qerr")): _*)
  }

  // ---- DuckDB relational twins (VALUES codebook tables — compact
  // SQL text instead of a 512-expression forest) --------------------

  private def cellsValues: String =
    "cells(cid, csq, c) AS (VALUES " +
      IvfCentroids.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, ${fd(csqIvf(i))}, ${listLit(c)})"
      }.mkString(",\n    ") + ")"

  private def rcbValues: String = {
    val b = PqResidualCodebooks.codebooks
    "rcb(sub, code, ccsq, cb) AS (VALUES " +
      (for (s <- b.indices; j <- b(s).indices) yield {
        var acc = 0.0; b(s)(j).foreach(x => acc += x * x)
        s"($s, $j, ${fd(acc)}, ${listLit(b(s)(j))})"
      }).mkString(",\n    ") + ")"
  }

  /** Shared oracle CTE chain: v → assignment → residual → per-(vec,
    * sub) best residual code. `best(vec_id, cell, e, sub, code, d)`
    * where e is the RESIDUAL. */
  private def encCtes: String =
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |$cellsValues,
       |ad AS (SELECT vec_id, e, cid, c,
       |    csq - 2.0 * ${fold2("e", "c")} AS d FROM v, cells),
       |asg AS (SELECT vec_id, e, cid AS cell, c FROM ad
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
       |res AS (SELECT vec_id, cell,
       |    list_transform(list_zip(e, c), x -> x[1] - x[2]) AS e FROM asg),
       |$rcbValues,
       |dd AS (SELECT vec_id, cell, e, sub, code,
       |    ccsq - 2.0 * ${fold2(s"e[(sub*$subDim+1):((sub+1)*$subDim)]", "cb")} AS d
       |  FROM res, rcb),
       |best AS (SELECT vec_id, cell, e, sub, code, d FROM dd
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) = 1)""".stripMargin

  val ops: Seq[OpSpec] = Seq(
    // Residual-PQ encode: cell + m 4-bit residual codes + exact
    // reconstruction error vs (centroid + decoded residual).
    OpSpec(
      "vec_ivfpq_encode",
      (s, d) => ivfPqEncodeOf(T.embeddings(s, d)).orderBy("vec_id"),
      Some {
        val pivots = (0 until m)
          .map(s => s"cast(max(CASE WHEN sub = $s THEN code END) as bigint) AS rc$s")
          .mkString(", ")
        s"""WITH $encCtes,
           |terms AS (SELECT vec_id, cell, sub, code,
           |    ${foldSq(s"e[(sub*$subDim+1):((sub+1)*$subDim)]")} + d AS t
           |  FROM best)
           |SELECT vec_id, cast(cell as bigint) AS cell, $pivots,
           |  list_reduce(list_prepend(0.0, list(t ORDER BY sub)),
           |    (acc, x) -> acc + x) AS qerr
           |FROM terms GROUP BY vec_id, cell ORDER BY vec_id""".stripMargin
      },
    ),
    // IVF-ADC top-k for vector 0: per-cell query residuals feed a
    // (cell, sub, code) lookup table — 512 tiny rows, broadcast — and
    // corpus vectors are scored from codes alone.
    OpSpec(
      "sim_ivfpq_adc_topk",
      (s, d) => {
        val emb = T.embeddings(s, d)
        val enc = ivfPqEncodeOf(emb)
        val codes = enc.select(col("vec_id"), col("cell"),
            posexplode(array((0 until m).map(sub => col(s"rc$sub")): _*)).as(Seq("sub", "code")))
        val sess = emb.sparkSession
        import sess.implicits._
        val cells = IvfCentroids.centroids.toSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cell", "c")
        val rcb = {
          val b = PqResidualCodebooks.codebooks
          (for (sb <- b.indices; j <- b(sb).indices) yield {
            var acc = 0.0; b(sb)(j).foreach(x => acc += x * x)
            (sb, j.toLong, acc, b(sb)(j).toSeq)
          }).toDF("sub", "code", "ccsq", "cb")
        }
        val qr = emb.filter(col("vec_id") === 0)
          .select(expr("transform(embedding, x -> cast(x as double))").as("qe"))
          .crossJoin(broadcast(cells))
          .select(col("cell"), expr("zip_with(qe, c, (x, y) -> x - y)").as("qr"))
          .withColumn("qrsq",
            expr("aggregate(zip_with(qr, qr, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
        val lut = qr.crossJoin(broadcast(rcb))
          .select(col("cell"), col("sub"), col("code"),
            expr(s"ccsq - 2.0D * aggregate(zip_with(slice(qr, cast(sub*$subDim+1 as int), $subDim), cb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
              .as("lval"))
        codes.join(broadcast(lut), Seq("cell", "sub", "code"))
          .groupBy("vec_id", "cell")
          .agg(expr(
            """aggregate(transform(array_sort(collect_list(struct(sub, lval))),
              |  x -> x.lval), 0D, (acc, x) -> acc + x)""".stripMargin).as("s"))
          .join(broadcast(qr.select(col("cell"), col("qrsq"))), Seq("cell"))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), (col("s") + col("qrsq")).as("adc_dist"))
          .orderBy("adc_dist", "vec_id")
          .limit(10)
      },
      Some {
        s"""WITH $encCtes,
           |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
           |qr AS (SELECT cid AS cell,
           |    list_transform(list_zip(qe, c), x -> x[1] - x[2]) AS qr
           |  FROM q, cells),
           |qrs AS (SELECT cell, qr, ${foldSq("qr")} AS qrsq FROM qr),
           |lut AS (SELECT cell, sub, code,
           |    ccsq - 2.0 * ${fold2(s"qr[(sub*$subDim+1):((sub+1)*$subDim)]", "cb")} AS lval
           |  FROM qrs, rcb),
           |sc AS (SELECT b.vec_id, b.cell, b.sub, l.lval
           |  FROM best b JOIN lut l ON b.cell = l.cell AND b.sub = l.sub AND b.code = l.code),
           |per AS (SELECT vec_id, cell,
           |    list_reduce(list_prepend(0.0, list(lval ORDER BY sub)),
           |      (acc, x) -> acc + x) AS s
           |  FROM sc GROUP BY vec_id, cell)
           |SELECT p.vec_id, p.s + q2.qrsq AS adc_dist
           |FROM per p JOIN qrs q2 ON p.cell = q2.cell
           |WHERE p.vec_id <> 0
           |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin
      },
    ),
  )
}
