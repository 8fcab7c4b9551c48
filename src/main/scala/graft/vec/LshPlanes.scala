package graft.vec

/** Fixed random-hyperplane family for vector LSH (dedup_embed_lsh).
  *
  * Hyperplane LSH (SimHash for real vectors, Charikar 2002): bit j of a
  * vector's signature is the SIGN of its dot product with hyperplane j;
  * two vectors agree on a bit with probability 1 − θ/π (θ = their
  * angle), so banding b bits per band × n bands gives the standard
  * OR-of-ANDs collision curve — the same construction as the MinHash
  * banding in text/NearDup.scala, applied to embeddings.
  *
  * The planes are pseudo-random but FIXED: component (j, k) is a
  * splitmix64-style integer hash of j·dim + k mapped to [−0.5, 0.5) —
  * a pure function, reproducible from this source, no RNG state. The
  * SAME doubles are inlined as literals into the Spark plan and the
  * DuckDB oracle (the IvfCentroids / NearDup.hashFamily device), and
  * the dot products use the proven bit-equal ordered-fold spelling on
  * both sides, so every signature bit is bit-identical cross-engine.
  *
  * Scale knob (the reason this exists next to the fixed-16-cell sign
  * quantizer): bucket cardinality is 2^bitsPerBand PER BAND and grows
  * with the plane count — 16 planes / 4-bit bands here (oracle
  * tractability at test size); a 100 TB corpus would use e.g. 64
  * planes / 16-bit bands (65k buckets per band) so within-bucket pair
  * mining stays bounded. The sign-cell blocking of dedup_embed_cosine
  * has no such knob — its cell is forever 1/16 of the corpus.
  */
object LshPlanes {
  val nPlanes = 16
  val nBands = 4
  val bitsPerBand: Int = nPlanes / nBands
  val dim = 64

  /** Per-band plane-row STRIDE (round 18): band `b`'s bit `k` draws
    * plane `b * stride + k`, so every band owns a fixed row of 30
    * planes (the packing bound) and WIDENING a band — the bits/band ≈
    * log₂(n/c) scale knob — only APPENDS bits: a band's first j
    * buckets are the same function of the vector at every width ≥ j.
    * Under the old contiguous indexing (plane b·bits+k) changing the
    * width re-dealt every band's planes, so no two widths of "the
    * same" family were comparable. Refinement property: a width-j
    * bucket collision is IMPLIED by a width-i collision for i ≥ j —
    * widening monotonically prunes candidates, never re-draws them. */
  val stride = 30

  /** Bits cap for the ADAPTIVE gate family (the declared dedup_embed_*
    * queries): the DuckDB oracle text inlines `adaptCap` plane
    * literals per band behind CASE masks, so the cap bounds oracle
    * size, not the library — [[graft.vec.VecOps.autoEmbedLshFamily]]
    * keeps the full 30-bit range. 16 bits = 65k buckets/band ≈ 10⁶
    * vectors at target occupancy 16 — past any corpus you'd gate
    * against a single-node oracle. */
  val adaptCap = 16

  /** The SCALE family (dedup_embed_lsh_scale): same band count, twice
    * the bits per band → 256 buckets/band instead of 16. E[bucket
    * size] drops 16×, so within-bucket pair mining — the Θ(n²/buckets)
    * term the sf1 stress run exposed (BASELINE.md "sf1 scale-stress":
    * 46× at 10× data) — drops ~16× at the same corpus. The general
    * policy is bits/band ≈ log₂(n/c) for a constant target bucket
    * size c: each added bit doubles the bucket count, so the knob
    * tracks corpus growth with LOG cost in signature width. */
  object Scale {
    val nBands = 4
    val bitsPerBand = 8
    val nPlanes: Int = nBands * bitsPerBand
  }

  /** splitmix64 finalizer of i, mapped to uniform [−0.5, 0.5). */
  private def u(i: Long): Double = {
    var z = i * 0x9E3779B97F4A7C15L + 0xD1B54A32D192ED03L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  /** Plane j (at vector width `d`) is a pure function of (j, d) — ANY
    * (bands × bits) family a graft.api caller asks for draws its
    * planes from the same sequence on demand (memoized — plane text is
    * spliced into generated SQL, so each is computed once). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  def plane(j: Int, d: Int = dim): Array[Double] =
    planeCache.computeIfAbsent((j, d),
      _ => Array.tabulate(d)(k => u(j.toLong * d + k)))

  /** Sign bit of e·plane(j), Spark spelling (ordered fold over the
    * double array column `e` — the bit-equal dot device). */
  private def bitSpark(j: Int, d: Int): String = {
    val arr = plane(j, d).map(x => s"${x}D").mkString(",")
    s"(CASE WHEN aggregate(zip_with(e, array($arr), (x, y) -> x * y), 0D, (acc, x) -> acc + x) > 0 THEN 1 ELSE 0 END)"
  }

  /** Sign bit of e·plane(j), DuckDB spelling. */
  private def bitDuck(j: Int, d: Int): String = {
    val arr = plane(j, d).mkString(",")
    s"(CASE WHEN list_inner_product(e, [$arr]::DOUBLE[]) > 0 THEN 1 ELSE 0 END)"
  }

  /** Band b's bucket value (`bits` bits packed little-endian), Spark
    * text over array column `e` — bit k reads plane b·[[stride]]+k
    * (the refinement-property indexing). */
  def bandSparkG(b: Int, bits: Int, d: Int = dim): String = {
    require(bits >= 1 && bits <= stride, s"bitsPerBand must be in [1, $stride], got $bits")
    "cast(" + (0 until bits).map { k =>
      s"(${bitSpark(b * stride + k, d)} * ${1 << k})"
    }.mkString(" + ") + " as bigint)"
  }

  /** DuckDB twin of [[bandSparkG]]. */
  def bandDuckG(b: Int, bits: Int, d: Int = dim): String = {
    require(bits >= 1 && bits <= stride, s"bitsPerBand must be in [1, $stride], got $bits")
    "cast(" + (0 until bits).map { k =>
      s"(${bitDuck(b * stride + k, d)} * ${1 << k})"
    }.mkString(" + ") + " as bigint)"
  }

  /** Band b's bucket at a RUNTIME width, DuckDB text: all [[adaptCap]]
    * bit terms are inlined, each behind `CASE WHEN k < bits`, so ONE
    * static SQL string computes the same integer [[bandDuckG]] would
    * emit for whatever `bits` column is in scope (masked terms are
    * exactly the zero terms of the shorter packing — the refinement
    * indexing makes the widths prefix-compatible). DuckDB evaluates a
    * CASE branch only on its selection vector and `k < bits` is
    * query-constant, so planes past `bits` cost nothing per row. */
  def bandDuckMasked(b: Int, d: Int = dim): String =
    "cast(" + (0 until adaptCap).map { k =>
      s"(CASE WHEN $k < bits THEN ${bitDuck(b * stride + k, d)} * ${1 << k} ELSE 0 END)"
    }.mkString(" + ") + " as bigint)"

  /** Base-family band texts (the round-8 gate queries). */
  def bandSpark(b: Int): String = bandSparkG(b, bitsPerBand)
  def bandDuck(b: Int): String = bandDuckG(b, bitsPerBand)
}
