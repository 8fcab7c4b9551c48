package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline BPE merge-table trainer — the text-tier counterpart of
  * [[graft.vec.TrainPq]] (train once offline, inline the learned
  * constants as literals, replay the identical math in the gated
  * query AND its DuckDB oracle).
  *
  * Classic byte-pair-encoding training over the corpus word-frequency
  * table: start from characters, repeatedly merge the most frequent
  * adjacent symbol pair (ties broken lexicographically — deterministic,
  * SURVEY §2.0.6 bans nondeterminism), emit the first `nMerges` merged
  * units. The resulting MULTI-CHARACTER vocabulary drives the
  * `text_token_count_bpe` greedy longest-match tokenizer
  * (graft.ops.CurationOps.Bpe).
  *
  * Usage: runMain graft.tools.TrainBpe <sfDir> [nMerges]
  *
  * SCALE POLICY: training reads only the word-frequency table (vocab
  * rows, not corpus rows — one hash agg over the token stream); the
  * merge loop runs driver-side over ≤ |vocab| distinct words. The
  * learned table is a few hundred bytes — broadcast-inlined, never a
  * join side.
  */
object TrainBpe {
  /** Pure BPE trainer over (word, freq) — exposed for the spec to
    * re-derive the inlined literals bit-for-bit. */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[String] = {
    // each word as a symbol sequence; merge loop mutates these
    var words: Seq[(Array[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merged = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Array(a, b) =>
            pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // most frequent pair; ties broken lexicographically on (a, b)
        val ((a, b), n) = pairCounts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        if (n < 2) done = true // nothing repeats — stop early
        else {
          merged += (a + b)
          words = words.map { case (syms, f) =>
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                out += (a + b); j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, f)
          }
          i += 1
        }
      }
    }
    merged.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wf = graft.core.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (w, n) => (-n, w) }
    println(s"// corpus=$dir words=${wf.length} nMerges=$nMerges")
    val units = train(wf, nMerges)
    println("  val mergedUnits: Seq[String] = Seq(")
    println(units.map(u => "    \"" + u + "\"").mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
