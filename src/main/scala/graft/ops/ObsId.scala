package graft.ops

/** Per-call unique observation-name suffixes: Spark rejects two
  * CollectMetrics nodes with the same name in one query, so an op that
  * `observe`s under a fixed name can never appear twice in one plan
  * (e.g. two prefix joins unioned into one pair set). Ops suffix their
  * metric names with `ObsId.next()` to stay composable.
  */
private[ops] object ObsId {
  private val c = new java.util.concurrent.atomic.AtomicLong()
  def next(): Long = c.incrementAndGet()
}
