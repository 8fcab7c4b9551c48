package graft

import graft.ops.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Semantic bounds for the corpus-diagnostic operators (round 11
  * batch 2) — the hash gate proves cross-engine equality; these pin
  * the values to what the statistics MEAN. */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("text_zipf_slope: negative slope, full vocab ranked, one row per source") {
    val rows = Registry.queries("text_zipf_slope")(spark, TestSpark.sfSmoke).collect()
    assert(rows.length == 20) // 20 sources in the fixture
    rows.foreach { r =>
      val (src, nVocab, slope) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(nVocab > 1, s"$src vocab")
      // frequencies are non-increasing in rank by construction, so the
      // log-log OLS slope cannot be positive; a word-soup corpus is
      // flatter than natural text (Zipf ≈ −1) but still strictly falls
      assert(slope < 0.0 && slope > -2.0, s"$src slope $slope")
    }
  }

  test("text_js_divergence: bounded by [0, ln 2], near 0 for an IID source mix") {
    val rows = Registry.queries("text_js_divergence")(spark, TestSpark.sfSmoke).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (src, js) = (r.getString(0), r.getDouble(1))
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"$src js $js")
      // every source draws from the same generator vocabulary, so the
      // per-source mix sits close to the corpus mix — far from ln 2
      assert(js < 0.2, s"$src js $js suspiciously large for an IID mix")
    }
  }

  test("JS divergence is 0 against itself and ln 2 for disjoint supports") {
    // closed-form sanity of the formula the query uses, computed the
    // same way (fold of 0.5·p·ln(p/m) + 0.5·q·ln(q/m) over the union)
    def js(p: Map[String, Double], q: Map[String, Double]): Double =
      (p.keySet ++ q.keySet).toSeq.sorted.map { w =>
        val (pw, qw) = (p.getOrElse(w, 0.0), q.getOrElse(w, 0.0))
        val m = (pw + qw) / 2
        (if (pw > 0) 0.5 * pw * math.log(pw / m) else 0.0) +
          (if (qw > 0) 0.5 * qw * math.log(qw / m) else 0.0)
      }.sum
    val d = Map("a" -> 0.5, "b" -> 0.5)
    assert(math.abs(js(d, d)) < 1e-12)
    assert(math.abs(js(Map("a" -> 1.0), Map("b" -> 1.0)) - math.log(2.0)) < 1e-12)
  }

  test("hash embed: parity/bound invariants on the corpus; sha bits re-derived by hand") {
    val rows = graft.ops.Registry.queries("text_hash_embed")(spark, TestSpark.sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      (0 until 8).foreach { i =>
        val h = r.getLong(2 + i)
        // every token adds ±1: |h_i| ≤ n and h_i ≡ n (mod 2)
        assert(math.abs(h) <= n && ((h - n) % 2 == 0),
          s"doc ${r.getLong(0)} dim $i: h=$h n=$n")
      }
    }
    // independent re-derivation of the sign convention for one token
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .selectExpr("doc_id", "split(text, ' ') AS ws").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def b16(t: String): Int = {
      val d = md.digest(t.getBytes("UTF-8"))
      ((d(0) & 0xff) << 8) | (d(1) & 0xff) // first 4 hex chars
    }
    val expect = docs.toMap.map { case (id, ws) =>
      id -> (0 until 8).map(i =>
        ws.map(t => if (((b16(t) >> i) & 1) == 1) 1L else -1L).sum)
    }
    rows.foreach { r =>
      val want = expect(r.getLong(0))
      (0 until 8).foreach(i => assert(r.getLong(2 + i) == want(i),
        s"doc ${r.getLong(0)} dim $i"))
    }
  }
}
