package graft.fixtures

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.Page

/**
 * Deterministic Common-Crawl-style pages synthesis (input_hint schema:
 * url, warc_ts, html, text, lang). Pure function of row id (seed 42 folded
 * into a splitmix-style mix), so the table is identical regardless of
 * partitioning or parallelism — required for resumability tests and the
 * two-parallelism scaling benchmark.
 *
 * The 12 reference fixture inputs appear verbatim in dedicated rows
 * (i < fixtureTexts.size) so reference parity flows through the full
 * pipeline (FIXTURES.md §1).
 */
object Synth {

  /** Fixture query strings / coordinate literals from the reference's tests. */
  val fixtureTexts: Seq[String] = Seq(
    "Our office is in Schwabing, München near the park.",
    "Visit the UCL Centre for Advanced Spatial Analysis on Tottenham Court Road.",
    "The flat sits at 41.40139, 2.12870 uphill from the old town.",
    "Deliveries go to Seftigenstrasse 264, 3084 Wabern every Tuesday.",
    "Moabit, Berlin, Germany has excellent canals.",
    "Measured position 46.92793655395508 at longitude — see 46.92793655395508, 7.451352119445801 for the marker.",
    "Barcelona is lovely in October.",
    "Meet me at Carrer de Calatrava 64, Barcelona at noon.",
    "Waypoint logged: 48.1700887, 11.5884858 (north of the Isar).",
    "Survey point 52.53000, 13.34000 lies in the west of the city.",
    "Seftigenstrasse Bern is the search everyone tries first.",
    "Control point 51.52150, -0.13610 checked against the plan.",
    // DMS literal (SURVEY §2.7 E2; format per opencage.rs:442-445) that
    // resolves inside the Calatrava 64 building polygon
    "Surveyors marked 41° 24' 5.006'' N 2° 7' 43.332'' E on the door frame."
  )

  private val words = Array("the", "quick", "analysis", "page", "crawl", "web",
    "data", "spatial", "join", "index", "cell", "tile", "batch", "report",
    "street", "city", "map", "river", "route", "survey")

  private val langs = Array("de", "es", "en", "fr", "it")

  /** splitmix64 — stable pseudo-random stream per (seed, id, k). */
  private def mix(id: Long, k: Long): Long = {
    var z = id * 0x9E3779B97F4A7C15L + k * 0xC2B2AE3D27D4EB4FL + 42L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def positiveMod(x: Long, m: Int): Int = ((x % m + m) % m).toInt

  /** "%.5f" without java.util.Formatter (hot path: one Formatter alloc per
    * call costs more than the rest of the page build). */
  private def fmt5(v: Double): String = {
    val neg = v < 0
    val scaled = math.round(math.abs(v) * 100000.0)
    val ip = scaled / 100000L
    val fp = (scaled % 100000L).toInt
    val sb = new java.lang.StringBuilder(12)
    if (neg) sb.append('-')
    sb.append(ip).append('.')
    if (fp < 10000) sb.append('0')
    if (fp < 1000) sb.append('0')
    if (fp < 100) sb.append('0')
    if (fp < 10) sb.append('0')
    sb.append(fp)
    sb.toString
  }

  /** Deterministic page for row id i: Common-Crawl-realistic ~0.5-1.5 KB of
    * text in sentence blocks; each block has ~1/4 chance of a place-name
    * mention and ~1/8 of a coordinate literal — several mentions per page on
    * average, like real geo-bearing web pages. */
  def pageFor(i: Long): Page = {
    val nFix = fixtureTexts.size
    val text =
      if (i < nFix) fixtureTexts(i.toInt)
      else {
        val sb = new StringBuilder(1200)
        val nBlocks = 4 + positiveMod(mix(i, 1), 8)
        var blk = 0
        while (blk < nBlocks) {
          val k = blk * 100
          val nWords = 12 + positiveMod(mix(i, k + 9), 14)
          var w = 0
          while (w < nWords) {
            sb.append(words(positiveMod(mix(i, k + 10 + w), words.length))).append(' ')
            w += 1
          }
          val r = positiveMod(mix(i, k + 2), 8)
          if (r < 2) {
            // name mention: cycle through fixture places + filler
            val names = Array("Schwabing, München", "Moabit, Berlin",
              "Barcelona", "Carrer de Calatrava 64, Barcelona",
              "Seftigenstrasse 264, 3084 Wabern",
              "UCL Centre for Advanced Spatial Analysis",
              s"Fillerton ${positiveMod(mix(i, k + 3), 44)}")
            sb.append("near ").append(names(positiveMod(mix(i, k + 4), names.length)))
          } else if (r < 3) {
            // coordinate literal near a fixture centroid (stays inside
            // polygons ~half the time)
            val anchors = Array((2.12870, 41.40139), (7.451352119445801, 46.92793655395508),
              (11.5884858, 48.1700887), (13.34, 52.53), (-0.1361, 51.5215))
            val (alon, alat) = anchors(positiveMod(mix(i, k + 5), anchors.length))
            val jLon = (positiveMod(mix(i, k + 6), 2001) - 1000) / 1000.0 * 0.002
            val jLat = (positiveMod(mix(i, k + 7), 2001) - 1000) / 1000.0 * 0.002
            sb.append("at ").append(fmt5(alat + jLat)).append(", ")
              .append(fmt5(alon + jLon)).append(" exactly")
          }
          sb.append(". ")
          blk += 1
        }
        sb.append("end.")
        sb.toString
      }
    val url = s"https://example.org/p/$i"
    val ts = new Timestamp(1767225600000L + i * 1000L) // 2026-01-01T00:00:00Z + i s
    val html = ("<html><body>" + text + "</body></html>")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Page(url, ts, html, text, langs(positiveMod(mix(i, 8), langs.length)))
  }

  /** n synthesized pages as a typed Dataset, `parts` input partitions. */
  def pages(spark: SparkSession, n: Long, parts: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map(i => pageFor(i))
  }

  /** Page count for a testdata sf directory (sf0.01 -> 10k pages etc.). */
  def pagesForSf(sfDir: String): Long = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.001)
    math.max(1000L, (sf * 1000000).toLong)
  }

  def pagesDF(spark: SparkSession, sfDir: String): DataFrame =
    pages(spark, pagesForSf(sfDir)).toDF()
}
