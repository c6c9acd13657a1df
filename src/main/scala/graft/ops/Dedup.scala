package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators are shuffle-shaped for horizontal scale: exact dedup is a
  * hash groupBy; n-gram Jaccard and MinHash-LSH shuffle on shingle/bucket
  * keys (never all-pairs); SimHash bands by pigeonholed chunks. Candidate
  * generation is always followed by an exact verification join, so outputs
  * are exact over the candidate set.
  */
object Dedup {

  /** Exact duplicate groups over `byCols`: one row per group with >1 member,
    * keyed by the minimum id (deterministic representative).
    */
  def exactGroups(df: DataFrame, idCol: String, byCols: Seq[String]): DataFrame =
    df.groupBy(byCols.map(col): _*)
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("group_size"))
      .filter(col("group_size") > 1)
      .select("rep_id", "group_size")

  /** Exact dedup survivors: keep the smallest id per duplicate group.
    * (The reference's upsert-by-unique-field analog, W7:
    * `/root/reference/summa-core/src/components/index_writer_holder.rs:289-346`.)
    */
  def exactSurvivors(df: DataFrame, idCol: String, byCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(byCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles of a whitespace-tokenized text column (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))
      )
    )
  }

  /** Verify candidate (id_a, id_b) pairs with exact Jaccard over the full
    * shingle sets: candidates carry only the two ids through the shuffle; the
    * (distinct, so much smaller) candidate set re-joins the shingle arrays by
    * id — the arrays never ride through the candidate-generation join.
    */
  private def verifyJaccard(
      candidates: DataFrame, withSh: DataFrame, minJaccard: Double): DataFrame =
    candidates
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

  /** Exact n-gram Jaccard duplicate pairs via shingle-key self-join:
    * only pairs sharing >= 1 shingle are materialized (shuffle on shingle,
    * not all-pairs), then jaccard = |A∩B| / (|A|+|B|-|A∩B|) exactly over the
    * full shingle sets.
    *
    * @param maxShingleDf when > 0, shingles occurring in more than this many
    *        docs are dropped from CANDIDATE GENERATION (not verification) —
    *        the standard df-cap: one boilerplate shingle shared by f docs
    *        otherwise materializes f² candidate pairs. Trade-off: a pair
    *        whose every shared shingle is hot is missed; near-duplicates
    *        above a meaningful Jaccard threshold share many shingles, almost
    *        all of them rare, so recall loss is negligible in practice.
    *        0 (default) = exact/uncapped.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      maxShingleDf: Long = 0L
  ): DataFrame = {
    val withSh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    val exploded = withSh.select(col("id"), explode(col("sh")).as("s"))
    val keyed =
      if (maxShingleDf <= 0) exploded
      else {
        val w = Window.partitionBy("s")
        exploded.withColumn("__df", count(lit(1)).over(w))
          .filter(col("__df") <= maxShingleDf)
          .drop("__df")
      }
    val candidates = keyed.as("a")
      .join(keyed.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(candidates, withSh, minJaccard)
  }

  /** MinHash signature column: for each of `numHashes` seeds, the minimum
    * `xxhash64(shingle, seed)` over the doc's shingles — all computed with
    * codegen'd higher-order functions, no UDF.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(sh, x => xxhash64(x, s)))
    )

  /** MinHash + LSH banding near-duplicate pairs. Signatures are banded; docs
    * sharing a band-hash become candidates (shuffle on the band key — a
    * bucket-join, never all-pairs); candidates are verified with exact
    * n-gram Jaccard.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int,
      bands: Int,
      minJaccard: Double
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // the band join carries ONLY (id, band-key): shingle arrays re-join by id
    // during verification, halving the candidate-shuffle width
    val banded = withSh.select(
      col("id"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b).as("bh"))
        )
      ).as("bk")
    )
    val candidates = banded.as("a")
      .join(
        banded.as("b"),
        col("a.bk.band") === col("b.bk.band") && col("a.bk.bh") === col("b.bk.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(candidates, withSh.select(col("id"), col("sh")), minJaccard)
  }

  /** 64-bit SimHash over whitespace tokens weighted by tf (pure column
    * expressions would need 64 accumulators; a compact UDF is clearer and
    * this op is per-row embarrassingly parallel).
    */
  private val simhashUdf = udf { (text: String) =>
    if (text == null) 0L
    else {
      val counts = new java.util.HashMap[String, Int]()
      text.split(' ').foreach(w => counts.merge(w, 1, _ + _))
      val acc = new Array[Int](64)
      counts.forEach { (w, c) =>
        val h = scala.util.hashing.MurmurHash3.stringHash(w, 0x9747b28c).toLong << 32 |
          (scala.util.hashing.MurmurHash3.stringHash(w, 0x85ebca6b).toLong & 0xFFFFFFFFL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += c else acc(i) -= c
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  }

  def simhash(text: Column): Column = simhashUdf(text)

  /** SimHash near-duplicate pairs with hamming distance <= maxHamming.
    * Banding: split the 64-bit hash into `maxHamming + 1` chunks — any pair
    * within the distance bound shares at least one exact chunk (pigeonhole),
    * so candidates come from a bucket-join on (chunk_index, chunk_value).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    val hashed = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val chunkCols = (0 until chunks).map { c =>
      struct(
        lit(c).as("chunk"),
        shiftrightunsigned(col("sh"), c * bits).bitwiseAND(lit((1L << bits) - 1)).as("cv"))
    }
    val banded = hashed.select(col("id"), col("sh"), explode(array(chunkCols: _*)).as("ck"))
    banded.as("a")
      .join(
        banded.as("b"),
        col("a.ck.chunk") === col("b.ck.chunk") && col("a.ck.cv") === col("b.ck.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact embedding-cosine near-duplicate pairs (all-pairs — use for
    * verification / small dims; the scale path is
    * [[Similarity.lshCosinePairs]]).
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val withNorm = v.withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    withNorm.as("a")
      .join(withNorm.as("b"), col("a.id") < col("b.id"))
      .withColumn("dot",
        aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y), lit(0.0), (a, x) => a + x))
      .withColumn("cosine", col("dot") / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= minCos)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
