package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic multi-frame commits for the small serving stores — the
  * lexical four-frame index, the trigram-LM store, the tokenizer word
  * store, the PCA moments store, and the MinHash signature index —
  * the L11/X3se commit grammar at frame scale: a versioned save
  * writes EVERY frame under an immutable `_v<n>/` root and ONE marker
  * create (`_commits/<n>`) is the commit point. This closes the
  * documented "the multi-frame overwrite is NOT atomic" weakness of
  * the in-place layouts: a crash mid-save leaves an uncommitted
  * `_v<n>` that nothing references (the previous version keeps
  * serving exactly), never a store with two frames new and two old.
  *
  * It also retires the hold-`localCheckpoint`-before-save discipline
  * for versioned saves: a read-modify-write cycle writes into a NEW
  * version root, so the frames it derived from are never the
  * directories being replaced — no pin needed (the in-place saves pin
  * for exactly that reason). A reader that resolved version n keeps
  * reading its frames unchanged while later saves publish on top;
  * [[vacuum]] is the physical purge on the caller's retention
  * schedule (never below a version a reader still pins).
  *
  * Loads resolve transparently ([[read]]): a store with a committed
  * version reads `_v<n>/<frame>`, a legacy store reads `<frame>` at
  * the root — existing layouts keep working unchanged and the
  * versioned save is opt-in per call site (the first versioned save
  * on a legacy store simply publishes v1; the legacy frames become
  * unreferenced residue).
  *
  * Scale notes (100 TB): these stores are vocabulary-, signature-, or
  * d²-sized — versions cost one extra directory level and markers are
  * empty files; the commit itself is the same frame writes the
  * in-place save already paid, minus the localCheckpoint pin. */
object FrameVersions {

  /** Latest committed version at `dir` (0 = legacy / no versioned
    * save yet). */
  def current(spark: SparkSession, dir: String): Long = {
    val commits = new org.apache.hadoop.fs.Path(s"$dir/_commits")
    val fs = commits
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) 0L
    else fs.listStatus(commits).filter(_.isFile)
      .map(_.getPath.getName)
      .filter(_.matches("[0-9]+"))
      .map(_.toLong)
      .foldLeft(0L)(math.max)
  }

  /** Commit `frames` as the next version: write each under
    * `_v<n+1>/<name>`, then the single marker create commits. A
    * crashed prior attempt's residue at `_v<n+1>` rewrites
    * idempotently (mode overwrite per frame). Returns the committed
    * version. */
  def commit(spark: SparkSession, dir: String,
      frames: Seq[(String, DataFrame)]): Long = {
    require(frames.nonEmpty, "commit needs at least one frame")
    require(frames.map(_._1).distinct.size == frames.size,
      "frame names must be distinct")
    val n = current(spark, dir) + 1
    frames.foreach { case (name, df) =>
      require(!name.startsWith("_") && !name.contains("/"),
        s"frame names must be plain directory names (got '$name')")
      df.write.mode("overwrite").parquet(s"$dir/_v$n/$name")
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/_commits/$n"), true)
      .close()
    n
  }

  /** Read `frame` from the latest committed version, or from the
    * legacy root when no versioned save has happened. */
  def read(spark: SparkSession, dir: String, frame: String)
      : DataFrame = {
    val n = current(spark, dir)
    if (n == 0L) spark.read.parquet(s"$dir/$frame")
    else spark.read.parquet(s"$dir/_v$n/$frame")
  }

  /** Drop uncommitted residue: any `_v<k>` directory without its
    * marker (a save that never reached its commit point — nothing
    * references it). Safe on a clean or legacy store. */
  def recover(spark: SparkSession, dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val committed = {
      val commits = new org.apache.hadoop.fs.Path(s"$dir/_commits")
      if (!fs.exists(commits)) Set.empty[Long]
      else fs.listStatus(commits).filter(_.isFile)
        .map(_.getPath.getName).filter(_.matches("[0-9]+"))
        .map(_.toLong).toSet
    }
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.matches("_v[0-9]+") &&
        !committed.contains(n.drop(2).toLong))
      .foreach(n => fs.delete(
        new org.apache.hadoop.fs.Path(s"$dir/$n"), true): Unit)
  }

  /** Drop committed versions below the kept horizon (default: keep
    * only the current) plus uncommitted residue. Returns the number
    * of versions dropped. Contract: never vacuum below a version a
    * reader still pins. */
  def vacuum(spark: SparkSession, dir: String,
      keepLast: Int = 1): Long = {
    require(keepLast >= 1, "vacuum must keep at least the current")
    val cur = current(spark, dir)
    require(cur >= 1, s"the store at $dir has no committed version")
    recover(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val floor = math.max(1L, cur - keepLast + 1)
    var dropped = 0L
    (1L until floor).foreach { n =>
      val d = new org.apache.hadoop.fs.Path(s"$dir/_v$n")
      if (fs.exists(d)) { fs.delete(d, true): Unit; dropped += 1 }
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_commits/$n"),
        false): Unit
    }
    dropped
  }
}
