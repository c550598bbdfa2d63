package graft

/** Build independent EAGER relations concurrently.
  *
  * Multi-arm compositions (q279 = dedup-mass × Shapley × DoReMi,
  * q270 = clusters × Shapley, q121 = signatures × exact ground truth)
  * chain `ckpt()` barriers inside each arm, and a ckpt executes its
  * upstream stages at query-CONSTRUCTION time. Built sequentially,
  * every arm's superstep tail leaves the rest of the machine idle;
  * Spark's scheduler happily runs the arms' jobs at once (optimization
  * guide §2.6 — "overlap independent jobs": FIFO scheduling back-fills
  * executors freed by one arm's stragglers with the next arm's tasks).
  * These helpers run each thunk on its own thread and return when all
  * are built, so independent arms overlap instead of serializing.
  *
  * Determinism: each arm is itself deterministic and the arms share no
  * mutable state — overlap changes only the wall clock, never a
  * result. Failures rethrow the first arm error. Threads are daemon
  * (a failed build can't pin the JVM) and the pool is unbounded but
  * short-lived per call — arms number ≤3 in every caller.
  */
object Par {
  private lazy val pool = java.util.concurrent.Executors
    .newCachedThreadPool(new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  private def submit[A](a: => A): java.util.concurrent.Future[A] =
    pool.submit(new java.util.concurrent.Callable[A] {
      override def call(): A = a
    })

  private def get[A](f: java.util.concurrent.Future[A]): A =
    try f.get()
    catch {
      // surface the arm's own exception, not the ExecutionException
      case e: java.util.concurrent.ExecutionException =>
        throw e.getCause
    }

  def par2[A, B](a: => A, b: => B): (A, B) = {
    val fa = submit(a); val fb = submit(b)
    (get(fa), get(fb))
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fa = submit(a); val fb = submit(b); val fc = submit(c)
    (get(fa), get(fb), get(fc))
  }
}
