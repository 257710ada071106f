package graft.model

/** Log redaction mode (reference api/v2/log.go:86 SetRedactMode,
  * backed by the pingcap errors RedactLog* modes): OFF prints
  * sensitive values, MARKER wraps them in ‹ ›, ON replaces them with
  * `?`. Transitions may only INCREASE restriction (OFF→MARKER→ON) —
  * relaxing redaction over an unauthenticated API would leak data a
  * compliance setting already promised to hide, so the reference
  * rejects downgrades and resolves races with a CAS loop; so does
  * this.
  */
object Redact {
  val Off = "off"
  val Marker = "marker"
  val On = "on"

  private val levels = Map(Off -> 0, Marker -> 1, On -> 2)
  private val mode = new java.util.concurrent.atomic.AtomicReference[String](Off)

  def current: String = mode.get()

  /** Restriction level; unknown modes rank most-restrictive (the
    * reference's defense-in-depth default). */
  def level(m: String): Int = levels.getOrElse(m.trim.toLowerCase, 2)

  /** Set the mode. Left(error) for an unknown mode or a downgrade;
    * Right(previousMode) on success (idempotent same-mode included). */
  def set(m: String): Either[String, String] = {
    val norm = m.trim.toLowerCase
    if (!levels.contains(norm))
      Left(s"invalid redact mode '$m': must be 'off', 'on', or 'marker'")
    else {
      var out: Either[String, String] = Left("unset")
      var done = false
      while (!done) {
        val cur = mode.get()
        if (level(norm) < level(cur)) {
          out = Left(s"cannot relax redaction from '$cur' to '$norm'")
          done = true
        } else if (mode.compareAndSet(cur, norm)) {
          out = Right(cur)
          done = true
        } // CAS lost: retry against the new current mode
      }
      out
    }
  }

  /** Test hook — modes are upgrade-only through [[set]]. */
  def reset(): Unit = mode.set(Off)

  /** Render a sensitive value under the current mode. */
  def apply(s: String): String = mode.get() match {
    case On => "?"
    case Marker => "‹" + s + "›"
    case _ => s
  }
}
