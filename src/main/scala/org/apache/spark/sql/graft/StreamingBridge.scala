package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the change-feed streaming source needs:
  * a DSv1 `Source.getBatch` must return a frame flagged `isStreaming=true`
  * (MicroBatchExecution asserts it), and the only constructor that sets the
  * flag is `SparkSession.internalCreateDataFrame` — package-private to
  * `org.apache.spark.sql`. Hosting this shim under that package is the
  * established extension technique (Delta Lake's whole DeltaSource lives in
  * `org.apache.spark.sql.delta` for exactly this reason); everything else in
  * the engine stays on public API.
  */
object StreamingBridge {

  /** Re-wrap a (fully planned) batch frame as a streaming micro-batch
    * frame: same rows, same schema, `isStreaming=true`.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The mirror doorway for a DSv1 `Sink.addBatch`: the frame the engine
    * hands in is an incremental-execution streaming plan that refuses batch
    * writes; re-plan its rows as a plain batch frame (what ForeachBatchSink
    * does internally) so the sink can use the ordinary write path.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
