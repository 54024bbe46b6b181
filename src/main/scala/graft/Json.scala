package graft

/** JSON string-literal escaping for the artifact writers — ONE
  * implementation (review r16: Bench and Verify each hand-rolled one;
  * an escaping fix applied to either would silently miss the other,
  * and both artifacts feed the driver's `json.load`). Escapes the two
  * JSON specials plus ALL control chars (named escapes for the common
  * whitespace trio, \\u00XX otherwise) — a tab or CR in builder-
  * authored SQL, or a quote in an environment-supplied path, would
  * otherwise make an artifact line unparseable.
  */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
