package graft

import java.util.concurrent.{SynchronousQueue, ThreadFactory, ThreadPoolExecutor, TimeUnit}

import scala.concurrent.ExecutionContext

/** The dedicated executor behind every overlapped-commit future
  * (independent substore commits in the index build/append, the
  * advance-day chains, the maintenance verbs). Previously these ran on
  * `ExecutionContext.Implicits.global`, which works only because
  * `Await.result`'s `blocking` wrapper lets that pool grow — an
  * implicit dependency on global-EC internals, and the threads were
  * anonymous in stack dumps. This pool makes the contract explicit:
  *
  *  - NAMED daemon threads (`graft-commit-N`) — a driver thread dump
  *    (guide §7.3) attributes every in-flight commit chain at a glance;
  *  - BOUNDED at [[maxThreads]] concurrent threads, far above the
  *    deepest real nesting (advance-day → append → three substores is
  *    ≤ ~10 live threads) but a hard cap all the same;
  *  - DEADLOCK-FREE under nested blocking `Await`s by construction:
  *    a synchronous-handoff queue plus caller-runs rejection means a
  *    task never waits BEHIND another task — at the cap the submitter
  *    simply runs the commit itself (graceful degradation to the
  *    sequential shape, never a stall).
  */
object Concurrency {

  private val maxThreads = 64

  private val factory: ThreadFactory = new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicLong(0)
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-commit-${n.getAndIncrement()}")
      t.setDaemon(true)
      t
    }
  }

  /** ExecutionContext for independent substore-commit futures. */
  implicit val commitEc: ExecutionContext = ExecutionContext.fromExecutor(
    new ThreadPoolExecutor(0, maxThreads, 30L, TimeUnit.SECONDS,
      new SynchronousQueue[Runnable](), factory,
      new ThreadPoolExecutor.CallerRunsPolicy))
}
