package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-n-gram language identification — the classic profile-overlap
  * heuristic (Cavnar–Trenkle shape) with small built-in profiles: score a
  * document against each language's distinctive character n-grams and
  * stopwords, predict the argmax. Pure Column composition (regexp counts
  * are codegen'd), row-local, no shuffle.
  *
  * Profiles are deliberately tiny and transparent; production would learn
  * them from a labeled corpus — the operator shape (featurize → score →
  * argmax → evaluate) is what the engine provides.
  */
object LanguageId {

  /** language → distinctive character n-grams / words. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("sch", "ein", "ich", "und", "der", "die", "ung"),
    "en" -> Seq("the", "th", "ing", "and", "of", "ed "),
    "es" -> Seq("ción", "los", "las", "que", "de ", "ll"),
    "fr" -> Seq("eau", "les", "des", "que", "est", "une"),
    "zh" -> Seq("zh", "sh", "xi", "qi", "ng "))

  /** Occurrence-count score of one profile against lowercased text. */
  def score(text: Column, grams: Seq[String]): Column =
    grams.map(g => regexp_count(lower(text), lit(g))).reduce(_ + _)

  /** Predicted language: argmax score, ties broken by language code order
    * (deterministic).
    *
    * NOTE: this single-Column form nests `when` trees, so Catalyst
    * duplicates every score subtree (≈2^langs regexp evaluations per
    * row). Fine for one-off use; for per-corpus scoring use
    * [[scoresArray]] behind a Generate barrier + [[pickFromScores]] —
    * each regexp then evaluates exactly once per row (measured ~5x on
    * q48).
    */
  def predict(text: Column): Column = {
    val scores = profiles.map { case (lang, grams) => lang -> score(text, grams) }
    // fold: keep the first language with the strictly-highest score.
    // Null text must predict null (matching pickFromScores): without the
    // guard every comparison is null, so the fold's otherwise() chain
    // would leak the seed language for null rows.
    val best = scores.tail.foldLeft((scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, s)) =>
        (when(s > bestScore, s).otherwise(bestScore),
          when(s > bestScore, lang).otherwise(bestLang))
    }._2
    when(text.isNotNull, best)
  }

  /** All profile scores as one array column (compute ONCE, then place a
    * Generate barrier — e.g. `explode(array(ss))` — between this and
    * [[pickFromScores]] so CollapseProject can't inline the regexps into
    * every consumer).
    */
  def scoresArray(text: Column): Column =
    array(profiles.map { case (_, grams) => score(text, grams) }: _*)

  /** First-argmax language from a materialized score array — identical
    * tie semantics to [[predict]] (earliest language wins ties, since
    * array_position returns the FIRST occurrence of the max).
    */
  def pickFromScores(ss: Column): Column =
    element_at(typedLit(profiles.map(_._1)),
      array_position(ss, array_max(ss)).cast("int"))
}
