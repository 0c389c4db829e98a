package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Batched model-annotation over a column — the reference's LLM
  * worker surface (deva/llm/client.py:48 `GPT.sync_query`/`:201
  * async_query`, worker_runtime.py) re-shaped for a cluster: deva
  * sends one prompt at a time from the event loop; at 100 TB the
  * annotation call runs ON THE EXECUTORS, batched per partition, so
  * throughput scales with partitions and the driver never sees a
  * prompt.
  *
  * The transport is pluggable: a real deployment passes an HTTP
  * endpoint call (the [[graft.sources.HttpIngest.postTo]] client
  * pattern — one client per partition, status-checked); this
  * container has zero egress, so specs use a deterministic local
  * function. The Spark-side contract — batching, schema, ordering
  * independence, per-partition client lifecycle — is the real,
  * tested part.
  */
object Inference {

  /** Annotate `textCol` of every row, `batchSize` prompts per call.
    * `call` receives one batch of prompts and must return exactly one
    * response per prompt, in order — the executor-side analogue of
    * `GPT.sync_query(list_of_prompts)`. `idCol` must be numeric and
    * non-null (it keys the responses back); null text becomes the
    * empty prompt rather than an executor NPE.
    */
  def annotate(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 32)(call: Seq[String] => Seq[String]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val ds: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"),
        coalesce(col(textCol).cast("string"), lit(""))).as[(Long, String)]
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val responses = call(batch.map(_._2))
        require(responses.length == batch.length,
          s"inference call returned ${responses.length} responses for ${batch.length} prompts")
        batch.map(_._1).zip(responses)
      }
    }.toDF(idCol, "response")
  }
}
