package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** One-call corpus curation — the end-to-end composition a training-data
  * pipeline actually runs, in the canonical order:
  *
  *  1. QUALITY: Gopher-style hard rules ([[GraftFunctions.gopher_rules]])
  *     drop junk first, so later (more expensive) stages never touch it.
  *  2. DEDUP: exact + MinHash near-dup collapse ([[Dedup.dedupCorpus]])
  *     on the quality survivors.
  *  3. DECONTAMINATE: benchmark-overlap removal
  *     ([[Decontaminate.decontaminate]]) on the deduped set — after dedup
  *     so each retained representative is checked once, not per copy.
  *  4. QUOTA (optional): deterministic weighted sample of at most
  *     `quotaPerGroup` docs per `quotaGroupCol`
  *     ([[Sampling.weightedSamplePerGroup]], weight = token count — longer
  *     docs preferred under the cap).
  *
  * Returns (curated corpus, decision report). The report has one row per
  * INPUT doc: (doc_id, stage, decision) where stage ∈ quality | dedup |
  * decontamination | quota | kept — so every drop is attributable, the
  * property that makes a 100 TB curation run debuggable.
  *
  * Scale notes: each stage is the already-audited operator — no new
  * shuffle shapes; the report is assembled from left-anti diffs of stage
  * outputs (id columns only, never text).
  */
object Curation {

  def curateCorpus(
      docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, benchIdCol: String,
      minWords: Int = 50, dedupThreshold: Double = 0.8,
      contaminationShingle: Int = 8,
      quotaGroupCol: Option[String] = None,
      quotaPerGroup: Int = Int.MaxValue): (DataFrame, DataFrame) = {

    val ids = docs.select(col(idCol))

    // 1. quality
    val q = docs.filter(
      GraftFunctions.gopher_rules(col(textCol), minWords).getField("pass"))
    // 2. dedup (exact + near) among quality survivors
    val d = Dedup.dedupedRows(q, textCol, idCol, dedupThreshold)
    // 3. decontamination
    val c = Decontaminate.decontaminate(d, textCol, idCol,
      bench, benchTextCol, benchIdCol, contaminationShingle)
    // 4. quota
    val kept = quotaGroupCol match {
      case Some(g) =>
        Sampling.weightedSamplePerGroup(
          c.withColumn("_w",
            GraftFunctions.token_count_ws(col(textCol)).cast("double")),
          g, idCol, "_w", quotaPerGroup).drop("_w")
      case None => c
    }

    def stageIds(df: DataFrame) = df.select(col(idCol))
    def dropped(before: DataFrame, after: DataFrame, stage: String) =
      stageIds(before).join(stageIds(after), Seq(idCol), "left_anti")
        .select(col(idCol).as("doc_id"), lit(stage).as("stage"),
          lit("dropped").as("decision"))

    val report = dropped(docs, q, "quality")
      .unionByName(dropped(q, d, "dedup"))
      .unionByName(dropped(d, c, "decontamination"))
      .unionByName(dropped(c, kept, "quota"))
      .unionByName(stageIds(kept)
        .select(col(idCol).as("doc_id"), lit("kept").as("stage"),
          lit("kept").as("decision")))

    (kept, report)
  }
}
