package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.model.Models.PriceTick
import graft.streaming.PriceAlerts.Alert

/** [[PriceAlerts]] re-expressed on Spark 4's `transformWithState` API —
  * the successor to flatMapGroupsWithState: typed named state
  * (`ListState`), explicit TTL, timers, and the RocksDB state store.
  * Same semantics: per tick, seconds until the first strictly
  * higher/lower price within a horizon; unresolved ticks emit the horizon
  * value.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider` (transformWithState is
  * RocksDB-only).
  */
class AlertProcessor(direction: Int, horizonSec: Double)
    extends StatefulProcessor[String, PriceTick, Alert] {

  @transient private var pending: ListState[PriceTick] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getListState[PriceTick](
      "pending", Encoders.product[PriceTick], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[PriceTick],
      timerValues: TimerValues): Iterator[Alert] = {
    val horizonMs = (horizonSec * 1000).toLong
    val incoming = rows.toList.sortBy(_.event_time.getTime)
    var open = pending.get().toList ++ incoming

    val out = scala.collection.mutable.ListBuffer.empty[Alert]
    for (t <- incoming) {
      val (resolved, still) = open.partition { p =>
        p.event_time.getTime < t.event_time.getTime &&
          (if (direction > 0) t.price > p.price else t.price < p.price)
      }
      resolved.foreach(p => out += Alert(key, p.event_time, p.price,
        (t.event_time.getTime - p.event_time.getTime) / 1000.0))
      open = still
    }

    val maxSeen = open.map(_.event_time.getTime).maxOption.getOrElse(0L)
    val (expired, kept) = open.partition(p => maxSeen - p.event_time.getTime >= horizonMs)
    expired.foreach(p => out += Alert(key, p.event_time, p.price, horizonSec))

    if (kept.isEmpty) pending.clear()
    else pending.put(kept.toArray)
    out.iterator
  }
}

object PriceAlertsTws {
  def alerts(
      ticks: Dataset[PriceTick],
      direction: Int,
      horizonSec: Double = 20.0)(implicit spark: SparkSession): Dataset[Alert] = {
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .transformWithState(
        new AlertProcessor(direction, horizonSec),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
