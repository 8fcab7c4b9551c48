package graft.text

/** Inlined document-quality (template/spam) logistic-regression
  * weights — trained OFFLINE by `runMain graft.tools.TrainQuality`
  * (deterministic fixed-seed fixture, no corpus leakage; provenance
  * note: docs/quality_model.md; re-derived bit-exactly by
  * QualityModelSpec via TrainQuality.fit on the same fixture).
  *
  * [[zText]] renders the decision function ONCE as SQL text shared by
  * the Spark query and the DuckDB oracle (the shared-formula device):
  * both engines read the identical exact-integer token aggregates
  * (n_tokens, n_distinct, sum_len, n_stop, h0..h7 — the
  * text_hash_embed bit-sums), so every feature division and product
  * runs in the same IEEE order. Weight literals go through
  * Double.toString (shortest round-trip — both engines parse back the
  * same double). The final sigmoid is rounded to 4 dp on both sides
  * (the r4 device: a libm-exp ulp wobble cannot survive the
  * rounding), and the decision bit is z > 0 — sigmoid-free, so it
  * never depends on exp at all.
  */
object QualityModel {

  // trained by TrainQuality (fixture seed=20260815, n=600, iters=4000,
  // lr=0.5, fixture accuracy=1.0)
  val weights: Array[Double] = Array(
    -0.6864045041622504,
    -1.135781657498822,
    -12.087327450753495,
    1.4177831149400992,
    -4.474800659302167,
    3.2820515754837043,
    3.853498522458927,
    4.2424055010756945,
    3.643272272868652,
    3.6015956107427076,
    2.7850748146906343,
    3.3529093889952297,
    3.7437256940155357)

  /** z = w·x over the exact-integer aggregate columns, as engine-shared
    * SQL text. Features (in weight order): 1, ln n_tokens,
    * n_distinct/n_tokens, sum_len/n_tokens, n_stop/n_tokens,
    * (h_i/n_tokens)² for i in 0..7. Squares are spelled v*v, never
    * power(v, 2) (Math.pow vs C pow can differ an ulp). */
  def zText: String = {
    val n = "cast(n_tokens as double)"
    val base = Seq(
      s"${weights(0)}",
      s"${weights(1)} * ln($n)",
      s"${weights(2)} * (cast(n_distinct as double) / $n)",
      s"${weights(3)} * (cast(sum_len as double) / $n)",
      s"${weights(4)} * (cast(n_stop as double) / $n)")
    val bits = (0 until 8).map { i =>
      s"${weights(5 + i)} * ((cast(h$i as double) / $n) * (cast(h$i as double) / $n))"
    }
    (base ++ bits).mkString("(", "\n  + ", ")")
  }

  /** Rounded spam probability, shared text (no alias). */
  def probText: String = s"round(1.0 / (1.0 + exp(-$zText)), 4)"

  /** exp-free decision bit, shared text (no alias). */
  def flagText: String = s"$zText > 0.0"
}
