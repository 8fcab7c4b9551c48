package graft.vec

import graft.core.{Policy => P, Tables => T}
import graft.ops.OpSpec
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor scale path: coarse quantization.
  *
  * `sim_cosine_topk` (LlmOps) is the brute-force baseline: one pass over
  * all vectors. This variant prunes first: each vector is assigned a
  * 4-bit cell from the SIGNS of its first four components (a fixed,
  * deterministic coarse quantizer — the IVF idea with 16 analytic cells
  * instead of learned centroids), and the search touches only the
  * query's cell, ~1/16 of the data. At 100 TB the cell becomes a
  * partition key: candidates are co-located, non-cell partitions are
  * pruned at the scan.
  *
  * Recall is partial (true neighbors can land in other cells) — that is
  * the ANN trade-off; AnnSpec measures recall vs the brute-force top-k.
  */
object VecOps {
  private def dot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  /** 4-bit sign-quantizer cell id (shared with LlmOps.sim_pairs_threshold
    * as its candidate-blocking key). */
  val cellExpr =
    "cast(" + (1 to 4).map(i =>
      s"(CASE WHEN cast(element_at(embedding, $i) as double) > 0 THEN ${1 << (i - 1)} ELSE 0 END)")
      .mkString(" + ") + " as bigint)"

  /** DuckDB spelling of [[cellExpr]]. */
  val cellSql =
    "cast(" + (1 to 4).map(i =>
      s"(CASE WHEN embedding[$i]::DOUBLE > 0 THEN ${1 << (i - 1)} ELSE 0 END)")
      .mkString(" + ") + " as bigint)"

  val ops: Seq[OpSpec] = Seq(
    // nprobe=5 IVF: search the query's cell AND its 4 Hamming-1
    // neighbor cells (sign flips of one quantizer bit) — the standard
    // IVF recall/cost knob. Still prunes 11/16 of the corpus; at scale
    // the 5 cells are 5 partition keys. Recall vs nprobe=1 measured in
    // AnnSpec.
    OpSpec(
      "sim_cosine_ivf_nprobe",
      (s, d) => {
        val v = T.embeddings(s, d)
          .select(col("vec_id"), expr(cellExpr).as("cell"),
            expr("transform(embedding, x -> cast(x as double))").as("e"))
        val q = v.filter(col("vec_id") === 0)
          .select(col("cell").as("qcell"), col("e").as("qe"))
        val probed = col("cell") === col("qcell") ||
          (0 until 4).map(b => col("cell") === (col("qcell").bitwiseXOR(1L << b)))
            .reduce(_ || _)
        v.join(broadcast(q), probed)
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("cell"),
            P.r4(dot("e", "qe") /
              (sqrt(dot("e", "e")) * sqrt(dot("qe", "qe")))).as("cos_sim"))
          .orderBy(desc("cos_sim"), col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH v AS (SELECT vec_id, $cellSql AS cell, embedding::DOUBLE[] AS e FROM embeddings),
              |q AS (SELECT cell AS qcell, e AS qe FROM v WHERE vec_id = 0)
              |SELECT vec_id, cell,
              |  round(list_inner_product(e, qe) /
              |        (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product(qe, qe))), 4) AS cos_sim
              |FROM v, q
              |WHERE (cell = qcell OR cell = xor(qcell, 1) OR cell = xor(qcell, 2)
              |       OR cell = xor(qcell, 4) OR cell = xor(qcell, 8))
              |  AND vec_id <> 0
              |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin),
    ),
    OpSpec(
      "sim_cosine_ivf",
      (s, d) => {
        val v = T.embeddings(s, d)
          .select(col("vec_id"), expr(cellExpr).as("cell"),
            expr("transform(embedding, x -> cast(x as double))").as("e"))
        val q = v.filter(col("vec_id") === 0)
          .select(col("cell").as("qcell"), col("e").as("qe"))
        v.join(broadcast(q), col("cell") === col("qcell"))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("cell"),
            P.r4(dot("e", "qe") /
              (sqrt(dot("e", "e")) * sqrt(dot("qe", "qe")))).as("cos_sim"))
          .orderBy(desc("cos_sim"), col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH v AS (SELECT vec_id, $cellSql AS cell, embedding::DOUBLE[] AS e FROM embeddings),
              |q AS (SELECT cell AS qcell, e AS qe FROM v WHERE vec_id = 0)
              |SELECT vec_id, cell,
              |  round(list_inner_product(e, qe) /
              |        (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product(qe, qe))), 4) AS cos_sim
              |FROM v, q WHERE cell = qcell AND vec_id <> 0
              |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin),
    ),
  )
}
