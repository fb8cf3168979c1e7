package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.Models.PriceTick
import graft.streaming.PriceAlerts.Alert

/** [[PriceAlerts]] re-expressed on Spark 4's `transformWithState` API —
  * the successor to flatMapGroupsWithState: typed named state
  * (`ListState`), explicit TTL, timers, and the RocksDB state store.
  * Same semantics: per tick, seconds until the first strictly
  * higher/lower price within a horizon; unresolved ticks emit the horizon
  * value. Resolution is first-qualifying-successor-in-*arrival*-order,
  * with watermark-driven expiry — see [[PriceAlerts.resolve]] for the
  * exact late-data contract.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider` (transformWithState is
  * RocksDB-only).
  */
class AlertProcessor(direction: Int, horizonSec: Double)
    extends StatefulProcessor[String, PriceTick, Alert] {

  @transient private var pending: ListState[PriceTick] = _
  // Timestamp of the one timer currently registered for this key, so a
  // re-arm can delete its predecessor. Without this, every input batch
  // leaves a stale timer behind: they all fire eventually as no-op
  // invocations, costing state-store work per key per batch.
  @transient private var armedTimer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    pending = getHandle.getListState[PriceTick](
      "pending", Encoders.product[PriceTick], TTLConfig.NONE)
    armedTimer = getHandle.getValueState[Long](
      "armed_timer", Encoders.scalaLong, TTLConfig.NONE)
  }

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
          t.event_time.getTime - p.event_time.getTime <= horizonMs &&
          (if (direction > 0) t.price > p.price else t.price < p.price)
      }
      resolved.foreach(p => out += Alert(key, p.event_time, p.price,
        (t.event_time.getTime - p.event_time.getTime) / 1000.0))
      open = still
    }

    out.iterator ++ expireAndRearm(key, open, timerValues)
  }

  /** Timer firing: no input rows, just watermark-driven expiry. */
  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Alert] = {
    // The timer that fired is the one we tracked; forget it before
    // re-arming so expireAndRearm doesn't try to delete a spent timer.
    if (armedTimer.exists() &&
        armedTimer.get() == expiredTimerInfo.getExpiryTimeInMs())
      armedTimer.clear()
    expireAndRearm(key, pending.get().toList, timerValues)
  }

  /** Emit horizon alerts for ticks the watermark has passed, persist the
    * rest, and re-arm a timer for the earliest outstanding expiry so quiet
    * keys still flush and release state. */
  private def expireAndRearm(
      key: String,
      open: List[PriceTick],
      timerValues: TimerValues): Iterator[Alert] = {
    val horizonMs = (horizonSec * 1000).toLong
    val wm = timerValues.getCurrentWatermarkInMs()
    val (expired, kept) = open.partition(p => wm >= p.event_time.getTime + horizonMs)
    val prev = if (armedTimer.exists()) Some(armedTimer.get()) else None
    if (kept.isEmpty) {
      pending.clear()
      prev.foreach(getHandle.deleteTimer)
      armedTimer.clear()
    } else {
      pending.put(kept.toArray)
      val next = kept.map(_.event_time.getTime).min + horizonMs
      if (!prev.contains(next)) {
        prev.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(next)
        armedTimer.update(next)
      }
    }
    expired.map(p => Alert(key, p.event_time, p.price, horizonSec)).iterator
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
