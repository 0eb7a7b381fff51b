package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ext.{TokenizerModel, Unigram}

/** Tokenize-at-admission — the DEPLOYMENT mode of the persisted
  * unigram model ([[graft.ext.TokenizerModel]]): a model trained and
  * persisted offline is FROZEN at stream start, and every arriving
  * document is encoded at ingest (doc-grain token counts, Viterbi
  * log-mass, OOV accounting) before it lands — the per-document
  * token-budget facts a training-data pipeline needs at pack time,
  * computed once at admission instead of by a later corpus pass.
  * Completes the tokenizer tier's production story: train once
  * (sampled), persist, serve batch ([[TokenizerModel]] encode) AND
  * stream (this ingest) — the [[DsirIngest]] frozen-model discipline
  * applied to tokenization.
  *
  * Contract (spec-pinned): after any number of batches, the appended
  * gold equals the one-shot batch [[Unigram.encodeDocs]] of every
  * arrived document under the SAME persisted model — the frozen model
  * makes per-doc rows PREFIX-STABLE (a doc's counts never change when
  * later batches arrive), and encode is OPEN-WORLD (unseen characters
  * take the pinned fallback score and are counted in n_oov_chars — a
  * stream WILL outrun any training corpus's character inventory; the
  * closed-world fail-fast would poison the whole batch for one novel
  * emoji).
  *
  * Replay safety: the [[IngestCommit]] append protocol — (batchId,
  * contentKey) marker as the fast-path no-op, anti-join against
  * committed gold so an unmarked replay re-lands only missing docs
  * and can never duplicate rows.
  *
  * Scale shape: the vocab-sized model is loaded ONCE at start
  * (driver-side, KB-scale) and rides into every batch plan as the
  * native-DP literal; each batch pays one map-side encode + one
  * doc-keyed partial aggregation + one append — zero joins except
  * the replay anti-join probe of committed gold.
  */
object TokenizeIngest {

  def tokenizeIngest(
      docs: DataFrame,
      modelDir: String,
      outDir: String,
      checkpoint: String)(
      implicit spark: SparkSession): StreamingQuery = {
    // freeze the persisted model NOW: vocab-sized rows to the driver,
    // version/kind-guarded — the deployed artifact, immune to
    // upstream retrains while the stream runs
    val (model, maxPieceLen, chunkChars) = TokenizerModel.loadUnigramModel(spark, modelDir)
    val fb = Some(Unigram.fallbackScore(model))
    val goldDir = s"$outDir/gold"
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val batchKey = IngestCommit.contentKey(batch.toDF())
        if (!IngestCommit.isCommitted(spark, outDir, batchId, batchKey)) {
          val encoded = Unigram.encodeDocs(
            model, batch.toDF(), maxPieceLen, chunkChars, fb)
          val fresh = IngestCommit.readCommitted(spark, goldDir) match {
            case Some(g) =>
              encoded.join(g.select(col("doc_id")), Seq("doc_id"), "left_anti")
            case None => encoded
          }
          // eager truncation decouples the goldDir READ (replay
          // anti-join) from the goldDir WRITE below — the DsirIngest
          // read-your-own-write-path lesson
          graft.ext.Checkpoints.truncate(fresh)
            .write.mode("append").parquet(goldDir)
          IngestCommit.mark(spark, outDir, batchId, batchKey)
        }
        ()
      }
      .start()
  }

  /** The one-shot batch equivalent the spec compares against. */
  def batchEncode(
      spark: SparkSession, modelDir: String, docs: DataFrame): DataFrame = {
    val (model, maxPieceLen, chunkChars) = TokenizerModel.loadUnigramModel(spark, modelDir)
    Unigram.encodeDocs(model, docs, maxPieceLen, chunkChars,
      Some(Unigram.fallbackScore(model)))
  }
}
