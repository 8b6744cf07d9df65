package graft.text

import java.util.regex.Pattern
import org.apache.spark.sql.functions.udf

/** EDGAR filing item extraction (SURVEY.md §2.7 F6; reference:
  * `Edgar.extract_item` `finds/unstructured/edgar.py:359-527`).
  *
  * A deterministic string→string function (registered as a UDF for use
  * over a filings `text` column): locates an item section (10-K MD&A,
  * 10-K business description, 10-K quantitative disclosures, 10-Q MD&A)
  * by a battery of begin/end/next sentinel regexes, scanning repeated
  * candidate passages and keeping the longest — the reference's "secret
  * sauce" marker sets reproduced pattern-for-pattern.
  */
object Edgar {

  private def p(re: String): Pattern =
    Pattern.compile(re, Pattern.CASE_INSENSITIVE)

  private case class Marker(itemBeg: Seq[Pattern], itemEnd: Seq[Pattern],
                            nextBeg: Seq[Pattern])

  // edgar.py:461-516 marker battery
  private val markers: Map[String, Marker] = Map(
    "mda10K" -> Marker(
      itemBeg = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?7[^a-z]+"),
        p("DISCUSSION AND ANALYSIS")),
      itemEnd = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?7A"),
        p("\\n\\s*?QUANTITATIVE AND QUALITATIVE DIS")),
      nextBeg = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?8"))),
    "qqr10K" -> Marker(
      itemBeg = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?7A"),
        p("\\n\\s*?QUALITATIVE AND QUANTITATIVE DIS"),
        p("\\n\\s*?QUANTITATIVE AND QUALITATIVE DIS")),
      itemEnd = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?8"),
        p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?9"),
        p("REPORT OF INDEPENDENT"), p("OPINION ON THE FINANCIAL"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?III[^\\w]+"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?3[^\\w]+")),
      nextBeg = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?8"),
        p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?9"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?III[^\\w]+"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?3[^\\w]+"))),
    "bus10K" -> Marker(
      itemBeg = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?1[^\\w]+"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?I[^\\w]+"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?1[^\\w]+"),
        p("\\n\\s*?BUSINESS.?\\n"), p("SUMMARY OF BUSINESS\\.?\\n"),
        p("DESCRIPTION OF BUSINESS\\.?\\n"), p("BUSINESS SUMMARY\\.?\\n")),
      itemEnd = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?1A"),
        p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?1B"),
        p("UNRESOLVED STAFF COMMENTS.?\\s*?\\n")),
      nextBeg = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?2[^0-9]+"))),
    "mda10Q" -> Marker(
      itemBeg = Seq(p("DISCUSSION AND ANALYSIS"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?I[^\\w]+"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?1[^\\w]+")),
      itemEnd = Seq(p("\\n\\s*?I\\s?T\\s?E\\s?M.?\\s*?3"),
        p("CONTROLS AND PROCEDURES"),
        p("\\n\\s*?QUANTITATIVE AND QUALITATIVE DIS")),
      nextBeg = Seq(p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?II[^\\w]+"),
        p("\\n\\s*?P\\s?A\\s?R\\s?T.?\\s*?2[^\\w]+"))))

  /** Header normalization before matching (edgar.py:451-459). */
  def cleanHeaders(text: String): String =
    text.toUpperCase
      .replace("\n.\n", ".\n")
      .replace("\nI\nTEM", "\nITEM")
      .replace("\nITEM\n", "\nITEM ")
      .replace("\nITEM  ", "\nITEM ")
      .replace(":\n", ".\n")
      .replace("$\n", "$")
      .replace("\n%", "%")
      .replace("\n", "\n\n")

  private def firstMatch(pats: Seq[Pattern], text: String, from: Int): Int =
    pats.iterator.map { pat =>
      val m = pat.matcher(text)
      if (m.find(from)) m.start else -1
    }.find(_ != -1).getOrElse(-1)

  /** One passage attempt from `start` (parse_helper edgar.py:404-448):
    * returns (passage, endOffsetWithinSlice).
    */
  private def parseOnce(text: String, mk: Marker, start: Int): (String, Int) = {
    val t = text.substring(math.min(start, text.length))
    val begin = firstMatch(mk.itemBeg, t, 0)
    if (begin == -1) return ("", 0)
    var end = firstMatch(mk.itemEnd, t, begin + 1)
    if (end == -1 && start != 0) end = firstMatch(mk.nextBeg, t, begin + 1)
    if (end > begin) (t.substring(begin, end).trim, end) else ("", 0)
  }

  /** Extract the requested item, scanning successive candidate passages
    * and returning the longest (edgar.py:518-527).
    * `item` ∈ {mda10K, bus10K, mda10Q, qqr10K}.
    */
  def extractItem(rawText: String, item: String): String = {
    val mk = markers.getOrElse(item,
      throw new IllegalArgumentException(s"unknown item: $item"))
    val text = cleanHeaders(rawText)
    var start = 0
    var (mda, end) = parseOnce(text, mk, start)
    if (mda.isEmpty) { start = 1; val r = parseOnce(text, mk, start); mda = r._1; end = r._2 }
    var best = mda
    while (mda.nonEmpty && end > 0) {
      start += end
      val r = parseOnce(text, mk, start)
      mda = r._1; end = r._2
      if (mda.nonEmpty && mda.length > best.length) best = mda
    }
    best
  }

  /** UDF form for a filings DataFrame `text` column. */
  def extractItemUdf(item: String) =
    udf((text: String) => if (text == null) "" else extractItem(text, item))
}
