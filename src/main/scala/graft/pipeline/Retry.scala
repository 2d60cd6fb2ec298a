package graft.pipeline

import scala.concurrent.duration._
import scala.util.control.NonFatal

/** Bounded retry with exponential backoff, re-expressing the reference's
  * `@retry` decorator (/root/reference/code/helpers.py:14-44: 3 attempts,
  * 5 s initial delay, ×2 backoff — applied to every external I/O). */
object Retry {
  def apply[A](
      attempts: Int = 3,
      delay: FiniteDuration = 5.seconds,
      backoff: Int = 2,
      onFailure: (Throwable, Int) => Unit = (_, _) => ())(f: => A): A = {
    var remaining = attempts
    var wait = delay
    while (true) {
      try return f
      catch {
        case NonFatal(e) =>
          remaining -= 1
          onFailure(e, remaining)
          if (remaining <= 0) throw e
          Thread.sleep(wait.toMillis)
          wait = wait * backoff.toLong
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
