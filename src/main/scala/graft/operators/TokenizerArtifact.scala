package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistence for the trained tokenizer — the (merges, vocab) pair — the
  * same artifact lifecycle [[VectorIndex]] gives the ANN index: training
  * builds the merge table and frequency-rank vocab offline, this writes
  * both as plain parquet, and an encode job loads them and tokenizes the
  * corpus without ever recomputing the vocab aggregate. Two tables under
  * one directory:
  *
  *   - `merges` — (rank, left, right), the ORDERED merge table (BPE merge
  *     order is the tokenizer: replaying the same merges in a different
  *     order produces different tokens). Bounded by the training budget
  *     (~256 rows), written as one footer.
  *   - `vocab` — (token, n_occurrences, token_id), the frequency-rank id
  *     space (t14c/t14d's `vocabRank` output, marked or unmarked per the
  *     caller). Bounded by alphabet + merges (each token at most doubled
  *     by its end-of-word-marked form), one footer.
  *
  * Paths are plain Spark parquet locations — `file:`/`hdfs:`/`s3a:` all
  * work. Parquet round-trips the string/long columns exactly, so a loaded
  * (merges, vocab) pair encodes identically to the just-trained one —
  * the t14f query's oracle (identical to t14e's) is the end-to-end
  * losslessness proof.
  */
object TokenizerArtifact {

  /** Conf key overriding where [[shippedDir]] looks for the COMMITTED
    * tokenizer artifact (specs point it at tampered copies to prove the
    * artifact — not the compiled table — is what a loading query applies).
    */
  val ShippedDirConf = "spark.graft.bpe.artifactDir"

  /** The TrainBpe-emitted artifact shipped IN the repo
    * (`artifacts/bpe_sf0.1`, committed parquet — regenerate with `runMain
    * graft.TrainBpe /root/testdata/sf0.1 256 artifacts/bpe_sf0.1`): the
    * directory form of the compiled [[graft.operators.TrainedMerges]]
    * table, trained by the same job on the same corpus, so queries loading
    * it replay the DuckDB oracles generated from the compiled constant.
    * Resolved against the working directory (the repo root under the
    * driver contract) unless [[ShippedDirConf]] overrides. Existence is
    * checked HERE with an error naming the conf knob: every other query
    * takes its inputs from the sfDir argument, so this is the one path
    * that breaks when the process runs from outside the repo root — a
    * bare parquet path-not-found deep in query construction (or worse, a
    * stray same-named directory at another CWD silently supplying a
    * different merge table) would be much harder to diagnose.
    */
  def shippedDir(spark: SparkSession): String =
    spark.conf.getOption(ShippedDirConf).getOrElse {
      // the existence check guards only the CWD-resolved default — a conf
      // override may name any Spark-readable URI (hdfs:/s3a:), which a
      // local File probe cannot see
      val dir = new java.io.File("artifacts/bpe_sf0.1").getAbsolutePath
      require(new java.io.File(dir, "merges").isDirectory,
        s"tokenizer artifact not found at $dir (no merges/ table): run " +
          s"from the repo root, or point $ShippedDirConf at a " +
          "TrainBpe-emitted artifact directory")
      dir
    }

  def save(spark: SparkSession, merges: Seq[(String, String)], vocab: DataFrame,
      dir: String): Unit = {
    import spark.implicits._
    // the two writes are independent jobs — overlap the tiny merges write
    // with the vocab aggregation job instead of serializing them (r17 opt,
    // the VectorIndex.save argument; guide §2.6)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val mergesF = Future {
      merges.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rank", "left", "right")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    }
    vocab.coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
    Await.result(mergesF, Duration.Inf)
  }

  /** The ordered merge table, rank-ascending — ready for
    * [[graft.functions.TextFunctions.bpeTokens]]/`bpeTokensMarked`. The
    * table is bounded by the training budget, so a driver-side collect is
    * a dimension read, never a corpus read.
    */
  def loadMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(s"$dir/merges").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left"), r.getAs[String]("right")))
      .sortBy(_._1).map(t => (t._2, t._3)).toSeq

  /** The vocab as a DataFrame — stays a (bounded) relation so the encode
    * join can broadcast it; the plan visibly READS the artifact instead of
    * recomputing the corpus aggregate.
    */
  def loadVocab(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/vocab")
}
