package graft.api

/** SURVEY.md §7.4 parity: lenient `years_covered` normalization at the API
  * edge. The reference accepts `'[2021, 2022]'`, `'2021,2022'`, a real
  * list, or a scalar, skipping non-digit entries, sorted-distinct output
  * (postgresql_service.py:369-393). Also covers the weather endpoint's
  * `'2020-2023'` range form (weather etl year-list parsing).
  */
object YearsParser {

  /** Parse any accepted textual form into sorted distinct years. */
  def parse(raw: String): Seq[Int] = {
    if (raw == null) return Nil
    val s = raw.trim
    if (s.isEmpty) return Nil
    val body = if (s.startsWith("[") && s.endsWith("]")) s.stripPrefix("[").stripSuffix("]") else s
    val parts =
      if (body.contains(",")) body.split(",").toSeq
      else if (body.matches("\\s*\\d+\\s*-\\s*\\d+\\s*")) {
        val Array(a, b) = body.split("-").map(_.trim)
        // toIntOption: an all-digit run beyond Int range (a pasted
        // timestamp) must be skipped like any other bad entry, not crash
        // the lenient parser
        return (for { ai <- a.toIntOption; bi <- b.toIntOption }
          yield (ai to bi).toSeq).getOrElse(Nil) // range form is already sorted-distinct
      } else Seq(body)
    parts.map(_.trim).filter(p => p.nonEmpty && p.forall(_.isDigit))
      .flatMap(_.toIntOption).distinct.sorted
  }

  /** Parse a heterogeneous value (list / scalar / string) like the
    * reference's `_extract_years_covered` field handling.
    */
  def parseAny(raw: Any): Seq[Int] = raw match {
    case null => Nil
    case s: String => parse(s)
    case i: Int => Seq(i)
    case l: Long => Seq(l.toInt)
    case d: Double => Seq(d.toInt)
    case xs: Seq[_] =>
      xs.map(x => String.valueOf(x).trim)
        .filter(x => x.nonEmpty && x.forall(_.isDigit))
        .flatMap(_.toIntOption).distinct.sorted
    case other => parse(String.valueOf(other))
  }
}
