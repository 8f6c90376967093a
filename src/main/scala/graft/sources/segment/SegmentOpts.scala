package graft.sources.segment

/** Clear-message parsing for user-supplied read/write option values.
  *
  * A bare `"abc".toLong` rejects a malformed option too, but with
  * `NumberFormatException: For input string: "abc"` — no mention of
  * WHICH of the dozen-odd options was malformed, on a surface (reader
  * and writer `.option(...)` maps) where the value usually arrives
  * through templating or job config rather than a human keystroke.
  * Every numeric/boolean option on the segment source parses through
  * here so the rejection names the option (the same clear-message
  * contract the catalog's TBLPROPERTIES validation already makes).
  */
private[segment] object SegmentOpts {

  def long(name: String, v: String): Long =
    scala.util.Try(v.trim.toLong).getOrElse(fail(name, v, "an integer"))

  def int(name: String, v: String): Int =
    scala.util.Try(v.trim.toInt).getOrElse(fail(name, v, "an integer"))

  def bool(name: String, v: String): Boolean = v.trim.toLowerCase match {
    case "true" => true
    case "false" => false
    case _ => fail(name, v, "true or false")
  }

  private def fail(name: String, v: String, want: String): Nothing =
    throw new IllegalArgumentException(s"$name must be $want, got '$v'")
}
