package graft.ops

import graft.core.{Tables => T}
import org.apache.spark.sql.functions._

/** §2.L UDF surface. Builtins beat UDFs (codegen, pushdown-transparent),
  * so the engine's rule is: UDF only where no builtin composition
  * exists. This declared query deliberately wraps a plain Scala UDF — a
  * text normalizer — to exercise registration, null handling and
  * determinism; its oracle re-implements the same logic in SQL.
  * (The UDF breaks codegen fusion at exactly one projection — visible
  * in the plan as a BatchEvalPython-free ObjectHashAggregate-free
  * simple Project(udf) — acceptable off the hot path.)
  */
object Udfs {
  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "udf_scalar",
      (s, d) => {
        val normalize = udf((t: String) =>
          if (t == null) null else t.trim.toLowerCase.replaceAll(" +", " "))
        T.documents(s, d)
          .filter(col("doc_id") < 50)
          .select(col("doc_id"),
            normalize(concat(lit("  "), col("text"), lit("  "))).as("norm_text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  lower(trim(regexp_replace('  ' || text || '  ', ' +', ' ', 'g'))) AS norm_text
             |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin),
    ),
  )
}
