package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Models.PriceTick

/** Bonus topics `btc-price-higher` / `btc-price-lower`: declared by the
  * reference's topic setup (reference setup_transform.py:129-130) but never
  * produced. We implement the natural semantics: for each tick, the time
  * (in seconds) until the first strictly higher / strictly lower price,
  * bounded by a horizon (default 20 s); ticks with no such successor
  * within the horizon resolve to the horizon value.
  *
  * Implemented with `flatMapGroupsWithState` — per-symbol state holds the
  * ticks still awaiting resolution; event-time timeout + watermark bound
  * the state size, so state is O(ticks within horizon) per symbol
  * regardless of stream length.
  */
object PriceAlerts {

  final case class Alert(symbol: String, event_time: Timestamp, price: Double, seconds_until: Double)

  final case class Pending(ticks: List[PriceTick])

  /** direction = +1 → time-until-higher; -1 → time-until-lower. */
  def resolve(direction: Int, horizonSec: Double)(
      symbol: String,
      in: Iterator[PriceTick],
      state: GroupState[Pending]): Iterator[Alert] = {
    val horizonMs = (horizonSec * 1000).toLong
    val incoming = in.toList.sortBy(_.event_time.getTime)
    val pending = state.getOption.map(_.ticks).getOrElse(Nil) ++ incoming

    val out = scala.collection.mutable.ListBuffer.empty[Alert]
    var remaining = pending
    for (t <- incoming) {
      val (resolved, stillOpen) = remaining.partition { p =>
        p.event_time.getTime < t.event_time.getTime &&
          (if (direction > 0) t.price > p.price else t.price < p.price)
      }
      resolved.foreach { p =>
        out += Alert(symbol, p.event_time, p.price,
          (t.event_time.getTime - p.event_time.getTime) / 1000.0)
      }
      remaining = stillOpen
    }

    // expire ticks past the horizon (no qualifying successor in time)
    val maxSeen = (state.getOption.map(_.ticks).getOrElse(Nil) ++ incoming)
      .map(_.event_time.getTime).maxOption.getOrElse(0L)
    val (expired, open) = remaining.partition(p => maxSeen - p.event_time.getTime >= horizonMs)
    expired.foreach(p => out += Alert(symbol, p.event_time, p.price, horizonSec))

    if (open.isEmpty) state.remove()
    else {
      state.update(Pending(open))
      if (state.getOption.isDefined && !state.hasTimedOut)
        state.setTimeoutTimestamp(maxSeen + horizonMs)
    }
    out.iterator
  }

  /** Wire onto a parsed, watermarked tick stream. */
  def alerts(
      ticks: Dataset[PriceTick],
      direction: Int,
      horizonSec: Double = 20.0)(implicit spark: SparkSession): Dataset[Alert] = {
    import spark.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        resolve(direction, horizonSec))
  }
}
