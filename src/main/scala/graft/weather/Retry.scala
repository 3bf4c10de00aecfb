package graft.weather

import scala.util.control.NonFatal

/** Bounded retry with backoff — the shape of the reference geocoder's
  * resilience loop (helper_geocoders.py:5-13: RateLimiter with 3 retries,
  * 2 s wait between attempts, 5 s per-call timeout). Thrown exceptions are
  * TRANSIENT (network hiccups, rate limits) and retried; a `None`/`Left`
  * produced by the body is a PERMANENT answer (bad input) and is returned
  * immediately by the callers that wrap this.
  *
  * Driver-side plumbing, not engine code: inside Spark tasks the native
  * retry is the scheduler's task re-attempt; this wrapper exists for the
  * per-location pre-flight calls that run once on the driver, where a
  * failed task would kill the whole fan-out.
  */
object Retry {

  /** Run `body` up to `attempts` times, sleeping `backoffMillis` between
    * failures. Returns the first success, or Left with the final error.
    * `sleep` is injectable so specs assert the backoff schedule without
    * waiting wall-clock.
    */
  def withBackoff[A](attempts: Int = 3, backoffMillis: Long = 2000,
                     sleep: Long => Unit = Thread.sleep)(body: => A): Either[String, A] = {
    require(attempts >= 1, "attempts must be >= 1")
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return Right(body)
      catch {
        case NonFatal(e) =>
          last = e
          i += 1
          if (i < attempts) sleep(backoffMillis)
      }
    }
    Left(s"failed after $attempts attempts: ${Option(last.getMessage).getOrElse(last.toString)}")
  }
}
