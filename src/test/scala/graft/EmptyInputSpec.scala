package graft

import graft.ops.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Robustness sweep: every declared query must EXECUTE (not throw) on
  * a zero-row corpus with the production schemas. At 100 TB empty
  * inputs are routine — a new partition, a filtered-out day, a source
  * with no documents yet — and a pipeline that NPEs on max()-of-
  * nothing or head-of-empty-list is not operable. Catches the classes
  * of bug sf-scaled fixtures never exercise: fold seeds, first/last on
  * empty frames, divisions fed by empty aggregates, label propagation
  * over an empty edge set.
  *
  * The fixture is built once per suite: each sf-smoke table re-written
  * with limit(0) (schema preserved, including the raw physical events
  * `ts` column — ns-int64 or µs-timestamp — the adaptive loader
  * normalizes).
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"${TestSpark.sfSmoke}/$t.parquet")
        .limit(0).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events: copy the RAW physical schema (ns-int64 or µs-timestamp,
    // whatever the current testdata ships) so the adaptive loader sees
    // the same dtype as production
    graft.core.Tables.eventsRaw(spark, TestSpark.sfSmoke)
      .limit(0).coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every declared query executes on a zero-row corpus") {
    val failures = Registry.all.flatMap { op =>
      try { Registry.queries(op.key)(spark, emptyDir).count(); None }
      catch { case e: Throwable =>
        Some(s"${op.key}: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries throw on empty input:\n${failures.mkString("\n")}")
  }

  /** n=1 exercises a different failure class than n=0: (n−1)
    * divisions, lag/lead frames of one row, single-member clusters,
    * interpolation with no bracketing neighbor. NaN/NULL outputs are
    * fine — crashes are not. */
  private lazy val oneRowDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_one").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"${TestSpark.sfSmoke}/$t.parquet")
        .limit(1).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    graft.core.Tables.eventsRaw(spark, TestSpark.sfSmoke)
      .limit(1).coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every declared query executes on a single-row corpus") {
    val failures = Registry.all.flatMap { op =>
      try { Registry.queries(op.key)(spark, oneRowDir).count(); None }
      catch { case e: Throwable =>
        Some(s"${op.key}: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries throw on 1-row input:\n${failures.mkString("\n")}")
  }

  /** ALL-IDENTICAL corpus (distinct primary keys, every other column
    * constant): the ZERO-VARIANCE regime — σ = 0 denominators, one
    * giant dedup clique, saturated hash bits, a single event type and
    * a single instant. Exercises the §2.0 nullif-guard policy for
    * real: under ANSI mode an unguarded x/0 THROWS, it doesn't NaN.
    * NaN/NULL outputs are fine — crashes are not. */
  private lazy val constantDir: String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_const").toString
    val idCols = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    idCols.foreach { case (t, id) =>
      val one = spark.read.parquet(s"${TestSpark.sfSmoke}/$t.parquet").limit(1)
      one.crossJoin(spark.range(20).toDF("_i"))
        .withColumn(id, col(id) * 1000L + col("_i"))
        .drop("_i")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    graft.core.Tables.eventsRaw(spark, TestSpark.sfSmoke).limit(1)
      .crossJoin(spark.range(20).toDF("_i"))
      .withColumn("event_id", col("event_id") * 1000L + col("_i"))
      .drop("_i")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every declared query executes on an all-identical (zero-variance) corpus") {
    val failures = Registry.all.flatMap { op =>
      try { Registry.queries(op.key)(spark, constantDir).count(); None }
      catch { case e: Throwable =>
        Some(s"${op.key}: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on the zero-variance corpus:\n${failures.mkString("\n")}")
  }

  /** HOSTILE corpus: pathological text (empty, whitespace-only, one
    * 10k-char token, unicode, tabs/newlines, stopword-only) and
    * pathological embeddings — above all the ZERO VECTOR at vec_id 0,
    * which is every sim query's QUERY id: cosine's ‖q‖ = 0 denominator
    * either nullif-guards or, under ANSI mode, throws. Crash-only
    * assertion (weird outputs are legal on weird inputs). */
  private lazy val hostileDir: String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_hostile").toString
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"${TestSpark.sfSmoke}/$t.parquet")
        .limit(1).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    graft.core.Tables.eventsRaw(spark, TestSpark.sfSmoke)
      .limit(1).coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    import spark.implicits._
    val texts = Seq(
      "", " ", "a", "ü ü 中文 中文 ü",
      "x" * 10000,
      "the a the a the a the a",
      "tab\there newline\nhere mixed",
      "normal words appear here exactly once each",
      null) // NULL text — real corpora have null fields
    texts.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t, "en", s"src${i % 3}",
          if (t == null) 0L else t.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dim = 64
    (0 until 20).map { i =>
      val e: Seq[Float] =
        if (i == 0) Seq.fill(dim)(0f) // zero vector AS THE QUERY id
        else if (i == 1) Seq.fill(dim)(1e-30f) // denormal-ish norms
        else if (i == 2) null // NULL embedding
        else Seq.tabulate(dim)(j => ((i * 31 + j * 7) % 13 - 6).toFloat)
      (i.toLong, e, i % 4)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("every declared query executes on the hostile corpus (zero vectors, empty/huge/unicode text)") {
    val failures = Registry.all.flatMap { op =>
      try { Registry.queries(op.key)(spark, hostileDir).count(); None }
      catch { case e: Throwable =>
        Some(s"${op.key}: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on the hostile corpus:\n${failures.mkString("\n")}")
  }
}
