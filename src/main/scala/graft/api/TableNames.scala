package graft.api

/** F14 dynamic table-name generator — byte-for-byte port of the
  * reference's naming scheme (helpers.py:21-120) so existing dashboards /
  * callers can address the same table names. In this engine the names are
  * logical identifiers (partition values / output dir names), not
  * per-filter physical tables.
  */
object TableNames {

  private val nameMappings = Map(
    "health_center_raw_data" -> "hc_raw",
    "health_center_lab_data" -> "hc_raw",
    "hc_analytics_yearly_statistics" -> "yearly_statist",
    "hc_analytics_gender_pos_by_year" -> "hc_data_gender_pos",
    "hc_analytics_village_pos_by_year" -> "hc_data_village_pos",
    "hc_analytics_total_summary" -> "hc_data_sum",
    "hc_analytics_monthly_positivity" -> "hc_data_monthly_pos",
    "analytics_yearly_statistics" -> "yearly_statist",
    "analytics_gender_pos_by_year" -> "hc_data_gender_pos",
    "analytics_village_pos_by_year" -> "hc_data_village_pos",
    "analytics_total_summary" -> "hc_data_sum",
    "analytics_monthly_positivity" -> "hc_data_monthly_pos",
    "rwanda_boundaries_all" -> "rwanda_boundaries",
    "hc_api_east_data" -> "hc_api_east")

  private def cleanLoc(s: String): Option[String] = {
    val c = s.toLowerCase.trim.replaceAll("[^a-zA-Z0-9]", "")
    if (c.nonEmpty && !c.forall(_.isDigit)) Some(c) else None
  }

  /** `generate_dynamic_table_name` parity (no years in names). */
  def dynamicTableName(baseName: String, district: Option[String] = None,
      sector: Option[String] = None): String = {
    val cleanBase = baseName.trim.toLowerCase
    var shortBase = nameMappings.getOrElse(cleanBase, cleanBase)
      .replace("statistics", "statist")
      .replace("health_center", "hc")
    if (shortBase.startsWith("health_") && shortBase.length > 20) shortBase = "hc_raw"

    def locParts(v: Option[String]): Option[String] =
      // case-insensitive sentinel: "All"/"ALL"/" all " must behave like
      // "all", or the same dataset silently splits across two table names
      v.filter(x => x.trim.toLowerCase != "all" && x.trim.nonEmpty).flatMap(cleanLoc)

    val locations = Seq(locParts(district), locParts(sector)).flatten
    var tableName = (shortBase +: locations).mkString("_")

    if (tableName.length > 63) {
      val remaining = 63 - shortBase.length - 2
      val fitted = scala.collection.mutable.ArrayBuffer.empty[String]
      var len = 0
      var broke = false
      for (loc <- locations if !broke) {
        if (len + loc.length + 1 <= remaining) {
          fitted += loc
          len += loc.length + 1
        } else {
          val available = remaining - len - 1
          if (available >= 3) fitted += loc.take(available)
          broke = true
        }
      }
      tableName = (shortBase +: fitted.toSeq).mkString("_")
    }

    tableName = tableName.replaceAll("_+", "_").stripPrefix("_").stripSuffix("_")
    if (tableName.isEmpty) shortBase else tableName
  }

  /** `_generate_monthly_weather_table_name` parity
    * (weather_data_prec_temp_etl_view.py:97-132): 12-char sanitized parts
    * in `weather_{prec}_prec_and_{temp}_temp_{district}_{sector}`, with the
    * reference's proportional re-fit when the name exceeds 60 chars (the
    * year_part participates in the budget arithmetic but never appears in
    * the final name — quirk preserved).
    */
  def weatherTableName(precStation: String, tempStation: String,
      district: String, sector: String, years: Seq[Int] = Nil): String = {
    def sanitize(name: String): String = {
      if (name == null || name.trim.isEmpty) "unknown"
      else {
        val s = name.toLowerCase.replaceAll("[^a-z0-9_]", "_")
          .replaceAll("_+", "_").stripPrefix("_").stripSuffix("_")
        val cut = s.take(12)
        if (cut.isEmpty) "unknown" else cut
      }
    }
    val prec = sanitize(precStation)
    val temp = sanitize(tempStation)
    val dist = sanitize(district)
    val sect = sanitize(sector)
    val yearPart =
      if (years.nonEmpty) {
        val sorted = years.sorted
        if (sorted.length <= 3) sorted.mkString("_") else s"${sorted.head}_${sorted.last}"
      } else "all"
    val name = s"weather_${prec}_prec_and_${temp}_temp_${dist}_${sect}"
    if (name.length <= 60) name
    else {
      val available = 60 - s"weather__prec_and__temp__$yearPart".length - 3
      val precMax = math.min(prec.length, available / 4)
      val tempMax = math.min(temp.length, available / 4)
      val distMax = math.min(dist.length, available / 4)
      val sectMax = available - precMax - tempMax - distMax
      def cut(s: String, n: Int) = if (n > 0) s.take(n) else s.take(3)
      s"weather_${cut(prec, precMax)}_prec_and_${cut(temp, tempMax)}_temp_" +
        s"${cut(dist, distMax)}_${cut(sect, sectMax)}"
    }
  }

  /** `generate_simple_table_name` parity (years appended sorted-distinct). */
  def simpleTableName(baseName: String, district: Option[String] = None,
      sector: Option[String] = None, years: Seq[Int] = Nil): String = {
    val parts = Seq(Some(baseName),
      district.map(_.toLowerCase.replace(" ", "")),
      sector.map(_.toLowerCase.replace(" ", ""))).flatten ++
      years.distinct.sorted.map(_.toString)
    parts.mkString("_").toLowerCase
  }
}
