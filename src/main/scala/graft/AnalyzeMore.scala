package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Overflow dispatch for [[Analyze]] CLI commands. The primary
  * command match in `Analyze.run` sits at the JVM's 64 KB
  * bytecode-per-method ceiling (r12 verdict) — new commands land here
  * and are tried from its default branch, so the established
  * `--flag` surface (parsed once in `Analyze.parse`) keeps working
  * without growing the saturated method. Returns None for commands
  * this object does not know either, letting the caller raise the
  * usual unknown-command error. */
private[graft] object AnalyzeMore {

  def dispatch(args: Analyze.Args,
      spark: SparkSession): Option[DataFrame] = args.command match {
    case "lmmaint" =>
      // exact trigram-LM count-store maintenance: --docs is the base
      // corpus the store was built from, --delta the added/replacement
      // docs, --target the removed docs WITH their text (the store
      // keeps no per-doc rows — erasure ships ground truth); output =
      // served KN perplexity off the maintained store (≡ full rebuild)
      require(args.docs.nonEmpty,
        "lmmaint needs --docs <base corpus dir>; --delta <added docs " +
          "dir> and --target <removed docs dir (with text)> are the " +
          "change batch (either may be omitted)")
      val base = spark.read.parquet(args.docs)
      val lm = graft.operators.Relevance.buildTrigramLm(base,
        args.idCol, args.textCol)
      val adds =
        if (args.delta.nonEmpty) spark.read.parquet(args.delta)
        else base.limit(0)
      val rems =
        if (args.target.nonEmpty) spark.read.parquet(args.target)
        else base.limit(0)
      val m = graft.operators.Relevance.maintainTrigramLm(lm, adds,
        rems, args.idCol, args.textCol)
      val post = base
        .join(rems.select(col(args.idCol)).unionByName(
            adds.select(col(args.idCol))).distinct(),
          Seq(args.idCol), "left_anti")
        .select(col(args.idCol), col(args.textCol))
        .unionByName(adds.select(col(args.idCol), col(args.textCol)))
      Some(graft.operators.Relevance.knTrigramFromModel(m.model, post,
        args.idCol, args.textCol))
    case "zorder" =>
      // Z-order (Morton) layout: --docs <table dir>, --cols a,b[,c]
      // names the clustered integral columns, --bits the per-column
      // resolution, --buckets the z-range bucket count; --mode stats
      // emits the per-bucket min/max skipping envelope instead of the
      // laid-out rows
      require(args.docs.nonEmpty && args.colsList.nonEmpty,
        "zorder needs --docs <table dir> and --cols <c1,c2,...>; " +
          "--bits N (default 8), --buckets N, --mode rows|stats")
      val laid = graft.operators.Layout.zOrderLayout(
        spark.read.parquet(args.docs), args.colsList, args.bits,
        args.buckets)
      Some(args.mode match {
        case "stats" => graft.operators.Layout.fileSkippingStats(
          laid, "_bucket", args.colsList)
        case _ => laid
      })
    case "hilbert" =>
      // Hilbert-curve layout (2-D): same surface as zorder but the
      // curve index; --cols must name exactly two integral columns
      require(args.docs.nonEmpty && args.colsList.size == 2,
        "hilbert needs --docs <table dir> and --cols <x,y> (exactly " +
          "two); --bits N (default 8), --buckets N, --mode rows|stats")
      val hLaid = graft.operators.Layout.hilbertLayout(
        spark.read.parquet(args.docs), args.colsList(0),
        args.colsList(1), args.bits, args.buckets)
      Some(args.mode match {
        case "stats" => graft.operators.Layout.fileSkippingStats(
          hLaid, "_bucket", args.colsList)
        case _ => hLaid
      })
    case "pca" =>
      // PCA over an embedding column: --vectors <dir>, --vec-col,
      // --merges reused as k (component count), --iterations the
      // power-iteration budget; --mode moments emits the exact
      // second-moment model instead of the projections
      require(args.vectors.nonEmpty,
        "pca needs --vectors <dir>; --vec-col <col> (default " +
          "embedding), --id-col <col>, --merges <k components>, " +
          "--iterations N, --mode project|moments")
      val vecs = spark.read.parquet(args.vectors)
      Some(args.mode match {
        case "moments" =>
          graft.operators.Similarity.pcaMoments(vecs, args.vecCol)
        case _ =>
          val model = graft.operators.Similarity.pcaFit(vecs,
            args.vecCol, k = args.merges, iters = args.iterations)
          graft.operators.Similarity.pcaProject(vecs, args.idCol,
            args.vecCol, model)
      })
    case _ => None
  }
}
