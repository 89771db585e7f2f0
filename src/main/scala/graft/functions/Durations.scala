package graft.functions

/** Duration-DSL parser (SURVEY F6).
  *
  * Accepts the reference's grammar (`Backend/Simulator/DBAPI/utils.py:6-76`):
  * `"1H" "30min" "2D" "1h30m" "2days 5hours" "10s" "1w"`, a bare number =
  * seconds, empty/`"0"` = 0. Unit matching is case-insensitive; unknown units
  * are an error (the reference silently treats them as 0 — we fail fast, but
  * expose [[parseOrZero]] for reference-faithful behavior). The reference also
  * ships a buggy variant returning `total_seconds - 30`
  * (`Backend/Simulator/DBAPI/utils.py:80-122`) which we deliberately do NOT
  * reproduce.
  */
object Durations {
  private val token = """(\d+(?:\.\d+)?)\s*([a-zA-Z]*)""".r

  private def unitSeconds(u: String): Option[Double] = u.toLowerCase match {
    case "" | "s" | "sec" | "secs" | "second" | "seconds" => Some(1d)
    case "m" | "min" | "mins" | "minute" | "minutes"      => Some(60d)
    case "h" | "hr" | "hrs" | "hour" | "hours"            => Some(3600d)
    case "d" | "day" | "days"                             => Some(86400d)
    case "w" | "week" | "weeks"                           => Some(604800d)
    case _                                                => None
  }

  /** Parse to whole seconds; `None` if the string has no valid tokens. */
  def parse(s: String): Option[Long] = {
    val trimmed = Option(s).getOrElse("").trim
    if (trimmed.isEmpty) return Some(0L)
    val toks = token.findAllMatchIn(trimmed).toSeq
    if (toks.isEmpty) return None
    val parts = toks.map { m =>
      unitSeconds(m.group(2)).map(_ * m.group(1).toDouble)
    }
    if (parts.exists(_.isEmpty)) None
    else Some(parts.flatten.sum.toLong)
  }

  /** Reference-faithful total function (unparseable ⇒ 0 seconds). */
  def parseOrZero(s: String): Long = parse(s).getOrElse(0L)
}
