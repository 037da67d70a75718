package graft.wds

/** Error-handler policies (B9): the reference threads a `handler`
  * callback through every stage
  * (`webdataset-private/webdataset/handlers.py:21-46`). The Spark mapping:
  *
  *  - Reraise       → propagate: the task (and job) fails.
  *  - IgnoreContinue / WarnContinue → drop the failing sample, keep the
  *    stream (Warn additionally logs); counted so jobs can report a
  *    quarantine metric instead of silently losing data.
  *  - IgnoreStop / WarnStop → truncate the current shard's stream at the
  *    failure point (the reference stops the whole iterator; mid-stream
  *    stop has no distributed analog, so the unit of stopping is the
  *    shard being read by the task — documented deviation, SURVEY §4.1).
  */
sealed trait Handler {
  def warn: Boolean
  def stop: Boolean
}

object Handler {
  case object Reraise extends Handler { val warn = false; val stop = false }
  case object IgnoreContinue extends Handler { val warn = false; val stop = false }
  case object WarnContinue extends Handler { val warn = true; val stop = false }
  case object IgnoreStop extends Handler { val warn = false; val stop = true }
  case object WarnStop extends Handler { val warn = true; val stop = true }

  /** Apply a policy to one failure; returns true if the stream should
    * continue past the failure, false to truncate. Reraise throws. */
  def handle(h: Handler, context: String, e: Throwable): Boolean = h match {
    case Reraise => throw e
    case other =>
      if (other.warn)
        System.err.println(s"[wds] $context: ${e.getClass.getSimpleName}: ${e.getMessage}")
      !other.stop
  }
}
