package graft.sources

/** S3 ingest heuristic parity: choose the village-level shapefile from an
  * archive listing by the reference's keyword/column/feature-count scoring
  * (country_adm_boundaries_upload_views.py:31-112). The actual shapefile
  * parsing is an ingest-boundary converter (no GDAL offline); this scoring
  * is the decision logic a converter plugs into.
  */
object ShapefilePicker {

  final case class Candidate(
      path: String,
      filename: String,
      columns: Seq[String] = Nil,
      featureCount: Int = 0)

  private val villageKeywords = Seq(
    "village", "villages", "settlements", "locality", "localities",
    "ward", "wards", "commune", "communes", "parish", "parishes",
    "hamlet", "hamlets", "town", "towns", "community", "communities",
    "adm4", "adm5", "level4", "level5", "lowest", "smallest",
    "cell", "cells", "sector", "sectors")

  private val villageNameIndicators = Seq(
    "village", "village_name", "villagename", "vill_name",
    "settlement", "locality", "community", "ward",
    "name", "nom", "nome", "nazwa", "cell_name",
    "sector_name", "commune_name")

  /** Reference scoring: +10 per filename keyword hit, +20 once for a
    * village-name column indicator, +5 when the file has >100 features
    * (the reference's `elif > 500: +10` branch is unreachable after
    * `> 100` matched — quirk preserved).
    */
  def score(c: Candidate): Int = {
    val fn = c.filename.toLowerCase
    val nameScore = villageKeywords.count(fn.contains) * 10
    val cols = c.columns.map(_.toLowerCase)
    val colScore =
      if (villageNameIndicators.exists(ind => cols.exists(_.contains(ind)))) 20 else 0
    val countScore = if (c.featureCount > 100) 5 else 0
    nameScore + colScore + countScore
  }

  /** Highest-scoring candidate; `maxBy` keeps the first of equal-score
    * candidates, matching the reference's stable reverse sort.
    */
  def pick(candidates: Seq[Candidate]): Option[Candidate] =
    if (candidates.isEmpty) None else Some(candidates.maxBy(score))

  private val villageNameKeywords = Seq(
    "village", "village_name", "villagename", "vill_name",
    "settlement", "settlement_name", "locality", "locality_name",
    "community", "community_name", "ward", "ward_name",
    "name", "nom", "nome", "nazwa",
    "cell", "cell_name", "sector", "sector_name",
    "commune", "commune_name", "parish", "parish_name")

  private val technicalColumns =
    Set("geometry", "geom", "shape", "objectid", "fid", "id")

  /** The reference's `identify_village_name_column`
    * (country_adm_boundaries_upload_views.py:115-171), quirks preserved:
    * exact keyword match +100, ONE partial keyword match +50, 'name'
    * +20 and 'nom' +20 are INDEPENDENT adds (so a literal `name` column
    * scores 170), technical columns zero out AFTER the adds, first
    * maximal column wins (Python `max` over insertion order), and a
    * zero-score board falls back to the first column containing 'name'.
    */
  def villageNameColumn(columns: Seq[String]): Option[String] = {
    val scored = columns.map { c =>
      val lc = c.toLowerCase
      var p = 0
      if (villageNameKeywords.contains(lc)) p += 100
      if (villageNameKeywords.exists(lc.contains)) p += 50
      if (lc.contains("name")) p += 20
      if (lc.contains("nom")) p += 20
      if (technicalColumns(lc)) p = 0
      c -> p
    }
    scored.collectFirst { case (c, p) if p == scored.map(_._2).max && p > 0 => c }
      .orElse(columns.find(_.toLowerCase.contains("name")))
  }
}
