package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Context-window chunking for training-data preparation
  * (beyond-parity; the step between document curation and sequence
  * packing): split each document into fixed-token windows with
  * overlap, one output row per chunk.
  *
  * Scale shape: entirely row-local — the fused [[TextExpressions.ChunkTokens]]
  * codegen kernel emits all chunks of a doc in one pass, `posexplode`
  * flattens them, and NOTHING shuffles. At 100 TB this is a map-only
  * stage whose output feeds [[Packing.assignShards]] (which does the
  * one bounded-state distribution pass).
  */
object Chunking {

  /** One row per (doc, chunk): (idCol, chunk_idx, chunk_text,
    * n_tokens). Chunk c starts at token c*(maxTokens-overlap);
    * consecutive chunks share `overlap` tokens; every token of the
    * doc is covered and the final chunk always contains at least one
    * token beyond the overlap. Token = whitespace split of
    * trim(text), case preserved (this output feeds the model, not a
    * hash).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame =
    df.select(col(idCol),
      posexplode(TextExpressions.chunk_tokens(col(textCol), maxTokens, overlap))
        .as(Seq("chunk_idx", "c")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_tokens").cast("long").as("n_tokens"))
}
