package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Streaming observability: one JSON line per finished micro-batch
  * (query name, batch id, input rows, processed rows/sec, batch
  * duration, watermark) appended to a metrics file — the minimal ops
  * surface a production CDC pipeline needs for lag/throughput
  * dashboards and alerting.
  */
class MetricsListener(path: String) extends StreamingQueryListener {

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    append(s"""{"event":"started","query":"${e.name}","id":"${e.id}"}""")

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    append(
      s"""{"event":"progress","query":"${p.name}","batchId":${p.batchId},""" +
        s""""numInputRows":${p.numInputRows},""" +
        s""""processedRowsPerSecond":${p.processedRowsPerSecond},""" +
        s""""durationMs":${Option(p.durationMs.get("triggerExecution")).getOrElse(0L)},""" +
        s""""watermark":"${Option(p.eventTime.get("watermark")).getOrElse("")}"}""")
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    append(s"""{"event":"terminated","id":"${e.id}","error":${e.exception.isDefined}}""")

  private def append(line: String): Unit = synchronized {
    Files.write(Paths.get(path), (line + "\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}

object Metrics {
  /** Install a metrics listener on the session; returns it for removal. */
  def install(spark: SparkSession, path: String): MetricsListener = {
    val l = new MetricsListener(path)
    spark.streams.addListener(l)
    l
  }
}
