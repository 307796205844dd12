package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (builder-prompt
  * first-class ops): language-ID, quality scoring, token counting,
  * document fingerprinting. All row-local (no shuffle); the heuristics are
  * deterministic so results are oracle-stable.
  */
object TextOps {

  /** Tiny embedded letter-bigram profiles (top bigrams per language drawn
    * from public letter-frequency tables). Scoring = overlap of the doc's
    * top bigrams with each profile; ties break lexicographically →
    * deterministic. A real deployment would embed full trigram profiles;
    * the Spark plumbing (row-local scalar kernel) is identical.
    */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
      "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar"),
    "de" -> Set("en", "er", "ch", "de", "ei", "nd", "te", "in", "ie", "ge",
      "un", "st", "be", "sc", "an", "di", "ic", "ne", "es", "au"),
    "es" -> Set("de", "es", "en", "el", "la", "os", "on", "as", "er", "ra",
      "ar", "re", "al", "an", "nt", "ue", "do", "ad", "ta", "co"),
    "fr" -> Set("es", "le", "de", "en", "on", "re", "nt", "ou", "an", "ai",
      "it", "te", "se", "et", "la", "au", "el", "me", "is", "ur")
  )

  def detectLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    val t = text.toLowerCase
    var i = 0
    while (i < t.length - 1) {
      val a = t.charAt(i); val b = t.charAt(i + 1)
      if (a.isLetter && b.isLetter) {
        val bg = s"$a$b"
        counts(bg) = counts.getOrElse(bg, 0) + 1
      }
      i += 1
    }
    if (counts.isEmpty) return "und"
    val top = counts.toSeq.sortBy { case (bg, n) => (-n, bg) }.take(20).map(_._1).toSet
    profiles.toSeq
      .map { case (lang, prof) => (lang, (prof & top).size) }
      .sortBy { case (lang, overlap) => (-overlap, lang) }
      .head._1
  }

  val langIdUdf = udf(detectLang _)

  /** Winnowed document fingerprint set (rolling-hash based; reuses the
    * suffix-pass winnowing kernel — Schleimer et al. 2003).
    */
  val fingerprintsUdf = udf { (text: String, k: Int, window: Int) =>
    SuffixPass.winnowFingerprints(if (text == null) "" else text, k, window)
  }

  /** Quality-score columns: length, alpha ratio, punctuation ratio,
    * stopword ratio, mean token length — standard corpus-filtering
    * heuristics (cf. C4/Gopher filtering rules), all built-ins.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val len = length(text)
    val toks = split(trim(text), "\\s+")
    val nToks = size(toks)
    val stop = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")
    val nStop = stop.map(w => size(filter(toks, x => x === w))).reduce(_ + _)
    Seq(
      len.cast("long").as("len"),
      round(length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
        greatest(len, lit(1)), 4).as("alpha_ratio"),
      round(length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
        greatest(len, lit(1)), 4).as("punct_ratio"),
      round(nStop.cast("double") / greatest(nToks, lit(1)), 4).as("stopword_ratio"),
      round((len - nToks + 1).cast("double") / greatest(nToks, lit(1)), 4).as("mean_tok_len"),
      nToks.cast("long").as("n_tokens"))
  }
}
