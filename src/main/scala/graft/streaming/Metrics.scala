package graft.streaming

import java.util.concurrent.atomic.{AtomicLongArray, DoubleAdder, LongAdder}
import scala.collection.concurrent.TrieMap

/** Minimal Prometheus exposition (text format 0.0.4) registry carrying
  * gravity's metric families (pkg/metrics/metrics.go:1-148) — the
  * `/metrics` surface gravity exports from its admin server, fed here
  * from Structured Streaming progress events instead of hand-timed
  * pipeline stages. No client library: counters are striped adders,
  * histograms fixed exponential bucket arrays rendered cumulatively.
  *
  * Family names match gravity where the signal exists on Spark
  * (namespace_subsystem_name): gravity_input_counter,
  * gravity_input_emitter_counter, gravity_emitter_scheduler_counter,
  * gravity_scheduler_output_counter, gravity_scheduler_retry_counter,
  * gravity_output_counter, and the latency histograms
  * gravity_input_latency / gravity_emitter_latency /
  * gravity_output_latency / gravity_process_time_latency /
  * gravity_event_time_latency (watermark lag), plus the
  * gravity_queue_length gauge.
  */
final class MetricsRegistry(val pipeline: String) {

  /** prometheus.ExponentialBuckets(start, factor, count) */
  private def exp(start: Double, factor: Double, count: Int): Array[Double] =
    Array.iterate(start, count)(_ * factor)

  private final case class Family(
      name: String, help: String, kind: String, buckets: Array[Double] = Array.empty)

  // the reference's bucket layouts, metrics.go:12-131
  private val families: Map[String, Family] = Seq(
    Family("gravity_input_counter", "Number of message input received(generated)", "counter"),
    Family("gravity_input_emitter_counter", "Number of message input sends to emitter", "counter"),
    Family("gravity_emitter_scheduler_counter", "Number of message emitter sends to scheduler", "counter"),
    Family("gravity_scheduler_output_counter", "Number of message scheduler sends to output", "counter"),
    Family("gravity_scheduler_retry_counter", "Number of retries scheduler attempt", "counter"),
    Family("gravity_output_counter", "Number of message output sends", "counter"),
    Family("gravity_input_latency", "Latency of input in seconds.", "histogram", exp(0.0005, 2, 15)),
    Family("gravity_emitter_latency", "Latency of emitter in seconds.", "histogram", exp(0.0005, 2, 15)),
    Family("gravity_output_latency", "Latency of output in seconds.", "histogram", exp(0.0005, 2, 18)),
    Family("gravity_scheduler_total_latency", "Latency of scheduler from the beginning of submit to the end of ack in seconds.", "histogram", exp(0.0005, 2, 15)),
    Family("gravity_process_time_latency", "Latency of end to end process time in seconds.", "histogram", exp(0.0005, 2, 19)),
    Family("gravity_event_time_latency", "Latency of end to end event time in seconds.", "histogram", exp(0.0005, 2, 15) ++ exp(0.0005 * (1 << 15), 8, 6)),
    Family("gravity_queue_length", "Length of specific queue.", "gauge"))
    .map(f => f.name -> f).toMap

  private final class Histo(nBuckets: Int) {
    val counts = new AtomicLongArray(nBuckets + 1) // + the +Inf bucket
    val sum = new DoubleAdder
  }

  private val counters = TrieMap.empty[(String, String), LongAdder]
  private val histos = TrieMap.empty[(String, String), Histo]
  // gauge = atomically-replaced double bits: a reset()+add() pair on an
  // adder would let a concurrent scrape observe 0 or a doubled value
  private val gauges =
    TrieMap.empty[(String, String), java.util.concurrent.atomic.AtomicLong]

  private def labelStr(labels: Seq[(String, String)]): String = {
    val all = ("pipeline" -> pipeline) +: labels
    all.map { case (k, v) =>
      s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString("{", ",", "}")
  }

  private def family(name: String): Family =
    families.getOrElse(name, throw new IllegalArgumentException(
      s"unknown metric family: $name (families are fixed to gravity's set)"))

  def inc(name: String, labels: Seq[(String, String)] = Nil, n: Long = 1L): Unit = {
    require(family(name).kind == "counter", s"$name is not a counter")
    counters.getOrElseUpdate((name, labelStr(labels)), new LongAdder).add(n)
  }

  def observe(name: String, seconds: Double, labels: Seq[(String, String)] = Nil): Unit = {
    val f = family(name)
    require(f.kind == "histogram", s"$name is not a histogram")
    val h = histos.getOrElseUpdate((name, labelStr(labels)), new Histo(f.buckets.length))
    var i = 0
    while (i < f.buckets.length && seconds > f.buckets(i)) i += 1
    h.counts.incrementAndGet(i)
    h.sum.add(seconds)
  }

  def setGauge(name: String, value: Double, labels: Seq[(String, String)] = Nil): Unit = {
    require(family(name).kind == "gauge", s"$name is not a gauge")
    gauges.getOrElseUpdate((name, labelStr(labels)),
      new java.util.concurrent.atomic.AtomicLong)
      .set(java.lang.Double.doubleToRawLongBits(value))
  }

  /** Prometheus text exposition, families sorted, series sorted. */
  def render(): String = {
    val sb = new StringBuilder
    def fmt(d: Double): String =
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
    families.values.toSeq.sortBy(_.name).foreach { f =>
      val series: Seq[String] = f.kind match {
        case "counter" =>
          counters.toSeq.filter(_._1._1 == f.name).sortBy(_._1._2).map {
            case ((_, ls), v) => s"${f.name}$ls ${v.sum()}"
          }
        case "gauge" =>
          gauges.toSeq.filter(_._1._1 == f.name).sortBy(_._1._2).map {
            case ((_, ls), v) =>
              s"${f.name}$ls ${fmt(java.lang.Double.longBitsToDouble(v.get()))}"
          }
        case "histogram" =>
          histos.toSeq.filter(_._1._1 == f.name).sortBy(_._1._2).flatMap {
            case ((_, ls), h) =>
              val inner = ls.stripPrefix("{").stripSuffix("}")
              var cum = 0L
              val bucketLines = f.buckets.zipWithIndex.map { case (le, i) =>
                cum += h.counts.get(i)
                s"""${f.name}_bucket{$inner,le="${fmt(le)}"} $cum"""
              }
              cum += h.counts.get(f.buckets.length)
              bucketLines.toSeq ++ Seq(
                s"""${f.name}_bucket{$inner,le="+Inf"} $cum""",
                s"${f.name}_sum$ls ${h.sum.sum()}",
                s"${f.name}_count$ls $cum")
          }
      }
      if (series.nonEmpty) {
        sb.append(s"# HELP ${f.name} ${f.help}\n")
        sb.append(s"# TYPE ${f.name} ${f.kind}\n")
        series.foreach(l => sb.append(l).append('\n'))
      }
    }
    sb.result()
  }
}
