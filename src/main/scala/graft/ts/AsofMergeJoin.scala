package graft.ts

import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Physical merge-based backward as-of join: the execution-level
  * alternative to the union-and-window plan in [[AsofJoin]].
  *
  * Both sides are hash-partitioned on the `by` key into the same number
  * of partitions (identical partitioning expressions → identical row
  * routing) and sorted within partitions by (by, ts). A single
  * two-pointer merge then streams each partition pair once —
  * `zipPartitions` is the deliberate use of the RDD layer for genuinely
  * imperative per-partition logic; everything before and after stays
  * DataFrame.
  *
  * vs the union-and-window form: same one shuffle + one sort per side,
  * but no unioned intermediate, no window-function state machine, and
  * the probe's payload columns never travel through the build rows —
  * on a wide probe at 100 TB that is a materially smaller sort. The
  * trade-off is bypassing Catalyst for the merge itself (no codegen,
  * no AQE inside the zip), which is why the declared queries keep the
  * pure-DataFrame form and this exists as the optimized library path
  * (AsofMergeJoinSpec proves both produce identical results).
  *
  * Deliberately backward/allow-exact only: the full direction × strict
  * matrix lives in the first-class Catalyst tier
  * ([[graft.plans.AsofJoinExec]]), which obsoletes this hand-scheduled
  * form for anything beyond the flagship shape — extend there, not here.
  */
object AsofMergeJoin {

  /** Backward as-of (allow-exact-match, left-join): probe columns ++
    * matched_ts ++ payload. `by` must be non-empty (keyed variant). */
  def backward(
      probe: DataFrame,
      build: DataFrame,
      on: String,
      by: Seq[String],
      payload: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    require(by.nonEmpty, "merge as-of requires a by-key; use AsofJoin.backward for global")
    // Hash-partitioning routes rows by (value, dtype): the same logical
    // key as int on one side and long on the other lands in DIFFERENT
    // partitions and the join silently misses. Likewise the merge's key
    // comparator only supports orderable scalars. Fail loudly up front
    // rather than returning wrong rows.
    val supportedKeyTypes: Set[org.apache.spark.sql.types.DataType] =
      Set(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.StringType)
    by.foreach { c =>
      val pt = probe.schema(c).dataType
      val bt = build.schema(c).dataType
      require(pt == bt,
        s"as-of by-column '$c' dtype mismatch: probe=$pt build=$bt — cast both sides to a common type first")
      require(supportedKeyTypes.contains(pt),
        s"as-of by-column '$c' has unsupported key type $pt (supported: bigint, int, string)")
    }
    val spark = probe.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val pSorted = probe
      .repartition(n, by.map(col): _*)
      .sortWithinPartitions((by :+ on).map(col): _*)
    val bSlim = build.select((by :+ on).map(col) ++ payload.map(col): _*)
    val bSorted = bSlim
      .repartition(n, by.map(col): _*)
      .sortWithinPartitions((by :+ on).map(col): _*)

    val pSchema = pSorted.schema
    val bSchema = bSorted.schema
    val outSchema = StructType(pSchema.fields ++
      (StructField("matched_ts", bSchema(on).dataType, nullable = true) +:
        payload.map(c => bSchema(c).copy(nullable = true))))

    val pTsIdx = pSchema.fieldIndex(on)
    val pByIdx = by.map(pSchema.fieldIndex)
    val bTsIdx = bSchema.fieldIndex(on)
    val bByIdx = by.map(bSchema.fieldIndex)
    val bPayIdx = payload.map(bSchema.fieldIndex)

    // by-keys are validated above to be matching long/int/string
    def keyOf(r: Row, idx: Seq[Int]): Seq[Any] = idx.map(r.get)
    def cmpKey(a: Seq[Any], b: Seq[Any]): Int =
      a.zip(b).iterator.map {
        case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
        case (x: Int, y: Int)       => Integer.compare(x, y)
        case (x: String, y: String) => x.compareTo(y)
        case (x, y) => throw new IllegalArgumentException(
          s"unsupported/mismatched as-of key values: $x (${x.getClass}) vs $y (${y.getClass})")
      }.find(_ != 0).getOrElse(0)
    def tsOf(r: Row, i: Int): Long = r.get(i) match {
      case t: java.sql.Timestamp => t.getTime * 1000 + (t.getNanos / 1000) % 1000
      case t: java.time.Instant  => t.getEpochSecond * 1000000L + t.getNano / 1000
      case l: Long               => l
      case other => throw new IllegalArgumentException(s"unsupported ts type: $other")
    }

    val merged = pSorted.rdd.zipPartitions(bSorted.rdd) { (probes, builds) =>
      val bIt = builds.buffered
      var lastKey: Seq[Any] = null
      var lastMatch: Row = null
      probes.map { p =>
        val pk = keyOf(p, pByIdx)
        val pts = tsOf(p, pTsIdx)
        if (lastKey == null || cmpKey(lastKey, pk) != 0) { lastMatch = null; lastKey = pk }
        var advance = true
        while (advance && bIt.hasNext) {
          val h = bIt.head
          val c = cmpKey(keyOf(h, bByIdx), pk)
          if (c < 0) { bIt.next(); lastMatch = null } // stale key, drop
          else if (c == 0 && tsOf(h, bTsIdx) <= pts) { lastMatch = bIt.next() }
          else advance = false
        }
        val extra: Seq[Any] =
          if (lastMatch == null) Seq.fill(payload.size + 1)(null)
          else lastMatch.get(bTsIdx) +: bPayIdx.map(lastMatch.get)
        Row.fromSeq(p.toSeq ++ extra)
      }
    }
    spark.createDataFrame(merged, outSchema)
  }
}
