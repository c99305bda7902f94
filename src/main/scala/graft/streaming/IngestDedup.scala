package graft.streaming

import org.apache.spark.sql.DataFrame

/** Ingestion-time dedup: an at-least-once transport (Kafka retries, file
  * re-uploads, task re-attempts) delivers some records more than once;
  * the pipeline's first stateful stage collapses them by delivery key so
  * everything downstream sees exactly-once data.
  *
  * Batch form: `dropDuplicates(keys)` — one shuffle on the key, and
  * since redelivered records are byte-identical the arbitrary-survivor
  * semantics are deterministic.
  *
  * Streaming form: watermark + `dropDuplicatesWithinWatermark` — state
  * is BOUNDED by the watermark delay (keys older than the watermark are
  * evicted), which is the property that lets the operator run forever at
  * production volume; plain streaming `dropDuplicates` would grow state
  * with every key ever seen. Redeliveries land within the transport's
  * replay horizon, so a delay covering that horizon removes them all —
  * IngestDedupSpec proves stream == batch on a doubled-delivery corpus.
  */
object IngestDedup {

  def dedupBatch(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicates(keys)

  def dedupStream(
      events: DataFrame,
      eventTimeCol: String,
      delay: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
