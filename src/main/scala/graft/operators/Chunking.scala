package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — split long documents into fixed-size overlapping
  * character windows, the preprocessing step that turns a raw corpus into
  * training-example-sized pieces (context-window fitting, RAG indexing).
  *
  * Chunk i covers 1-based character positions `[i·stride + 1, i·stride +
  * size]` with `stride = size − overlap`; the last chunk is the first one
  * whose window reaches the end of the text (it may be shorter than
  * `size`). Empty/short documents yield exactly one chunk; a NULL text
  * yields one chunk with NULL `chunk_text` (the row is preserved, not
  * dropped). Everything is a narrow projection + explode of a per-row
  * `sequence` — no shuffle, no UDF, fully whole-stage-codegen, and the
  * chunk count is derived arithmetic so the fan-out is plannable.
  *
  * Scale notes (100 TB): output row count is Σ ceil((len−overlap)/stride)
  * — bounded by corpus size / stride. Chunk text is re-sliced from the
  * parent row (no duplicated intermediate), and downstream per-chunk
  * operators (dedup, quality, embedding) see ordinary rows.
  */
object Chunking {

  /** @return one row per (doc, chunk): original columns + `chunk_id`
    *         (0-based), `chunk_text`, `chunk_len`. */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size >= 1, "size must be >= 1")
    require(overlap >= 0 && overlap < size,
      "overlap must be in [0, size)")
    val stride = size - overlap
    // coalesce: length(NULL) is null, and explode(sequence(0, null))
    // would silently DROP the document instead of emitting its one
    // null-text chunk
    val nChunks = greatest(lit(1L),
      ceil((coalesce(length(col(textCol)), lit(0)) - overlap) / lit(stride))
        .cast("long"))
    df.withColumn("chunk_id",
        explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk_text",
        expr(s"substring($textCol, chunk_id * $stride + 1, $size)"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
