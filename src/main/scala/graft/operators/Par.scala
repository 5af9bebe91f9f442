package graft.operators

/** Run independent Spark ACTIONS concurrently (guide §2.6: the
  * scheduler happily overlaps jobs from several driver threads;
  * actions are only sequential because driver code calls them
  * sequentially). The store builders write 2-6 independent tables per
  * call; each tiny write is latency-bound (scheduler round-trips +
  * commit protocol, not compute), so overlapping them collapses the
  * builder's wall toward its slowest write — and on a cluster the
  * same overlap back-fills executors freed by another write's task
  * tail. Every task is awaited; the first failure rethrows. Callers
  * must pass actions that touch DISJOINT tables and read no table
  * another task mutates.
  */
private[graft] object Par {
  def inParallel(tasks: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = tasks.map(t => Future(t()))
    fs.foreach(Await.result(_, Duration.Inf))
  }
}
