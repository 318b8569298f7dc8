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
}
