package graft.helpers

/** Spreadsheet A1N1 addressing helpers.
  *
  * Mirrors the reference semantics of `simpletasks_data/helpers.py:6-101`
  * (col2num / num2col / cell2coords / range2tab) as pure Scala — these run
  * driver-side when a Mapping is declared, never per row.
  */
object A1N1 {

  /** Column name → 0-based column number ("A" → 0, "AA" → 26). */
  def col2num(col: String): Int = {
    var num = 0
    col.foreach { c =>
      if (c.isLetter) num = num * 26 + (c.toUpper - 'A') + 1
    }
    num - 1
  }

  /** 1-based column number → column name (1 → "A", 27 → "AA"). */
  def num2col(n: Int): String = {
    val sb = new StringBuilder
    var x = n
    while (x > 0) {
      val rem = (x - 1) % 26
      x = (x - 1) / 26
      sb.insert(0, ('A' + rem).toChar)
    }
    sb.toString
  }

  private val CellRe = "^([A-Z]*)(\\d*)$".r

  /** A1N1 cell → (column, row), both 0-based, either side optional. */
  def cell2coords(cell: String): (Option[Int], Option[Int]) = cell match {
    case CellRe(c, r) =>
      val col = if (c.nonEmpty) Some(col2num(c)) else None
      val row = if (r.nonEmpty) Some(r.toInt - 1) else None
      (col, row)
    case _ =>
      throw new IllegalArgumentException(s"Could not parse range $cell")
  }

  /** A1N1 range ("A1:B5", wildcard end "A1:*") → (c0, r0, c1Opt, r1Opt). */
  def range2tab(range: String): (Int, Int, Option[Int], Option[Int]) = {
    val parts = range.split(":", -1)
    if (parts.length != 2)
      throw new IllegalArgumentException(s"Could not parse range $range")
    val (c0, r0) = cell2coords(parts(0))
    if (c0.isEmpty || r0.isEmpty)
      throw new IllegalArgumentException(s"Could not parse range $range")
    val (c1, r1) =
      if (parts(1) == "*") (None, None) else cell2coords(parts(1))
    (c0.get, r0.get, c1, r1)
  }
}
