package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Provider-style formatted-address synthesis (S3 in SURVEY.md §2.5) and the
 * per-country metadata lookup used by annotations (E8). All pure Column
 * expressions — codegen-friendly, no UDFs.
 */
object Format {

  /** Minimal country metadata (annotation lookups keyed by country_code —
    * /root/reference/src/opencage.rs:580-599: callingcode, currency, flag,
    * timezone). Extend by loading a real table; semantics identical. */
  case class CountryMeta(nameEn: String, names: Map[String, String],
                         timezone: String, currency: String,
                         callingCode: Int, flag: String)

  val countries: Map[String, CountryMeta] = Map(
    "de" -> CountryMeta("Germany", Map("de" -> "Deutschland", "fr" -> "Allemagne"),
      "Europe/Berlin", "EUR", 49, "🇩🇪"),
    "es" -> CountryMeta("Spain", Map("es" -> "España", "fr" -> "Espagne"),
      "Europe/Madrid", "EUR", 34, "🇪🇸"),
    "gb" -> CountryMeta("United Kingdom", Map("fr" -> "Royaume-Uni"),
      "Europe/London", "GBP", 44, "🇬🇧"),
    "ch" -> CountryMeta("Switzerland", Map("de" -> "Schweiz", "fr" -> "Suisse"),
      "Europe/Zurich", "CHF", 41, "🇨🇭"),
    "fr" -> CountryMeta("France", Map("fr" -> "France"),
      "Europe/Paris", "EUR", 33, "🇫🇷"),
    "it" -> CountryMeta("Italy", Map("it" -> "Italia"),
      "Europe/Rome", "EUR", 39, "🇮🇹"),
    "us" -> CountryMeta("United States", Map.empty,
      "America/New_York", "USD", 1, "🇺🇸"),
    "jp" -> CountryMeta("Japan", Map.empty, "Asia/Tokyo", "JPY", 81, "🇯🇵"),
    "br" -> CountryMeta("Brazil", Map.empty, "America/Sao_Paulo", "BRL", 55, "🇧🇷"),
    "au" -> CountryMeta("Australia", Map.empty, "Australia/Sydney", "AUD", 61, "🇦🇺"))

  /** cc -> localized country name as a literal map column (tiny; folds). */
  def countryNameCol(cc: Column, language: Option[String]): Column = {
    val pairs = countries.toSeq.flatMap { case (k, m) =>
      Seq(lit(k), lit(language.flatMap(m.names.get).getOrElse(m.nameEn)))
    }
    element_at(map(pairs: _*), cc)
  }

  private def metaCol(cc: Column, f: CountryMeta => Any): Column = {
    val pairs = countries.toSeq.flatMap { case (k, m) => Seq(lit(k), lit(f(m))) }
    element_at(map(pairs: _*), cc)
  }

  def timezoneCol(cc: Column): Column = metaCol(cc, _.timezone)
  def currencyCol(cc: Column): Column = metaCol(cc, _.currency)
  def callingCodeCol(cc: Column): Column = metaCol(cc, _.callingCode)
  def flagCol(cc: Column): Column = metaCol(cc, _.flag)

  /** Nominatim-style display_name: ordered comma join of non-null components
    * (order per the reference's sample documents,
    * /root/reference/src/openstreetmap.rs:249 and :321-337). */
  def osmDisplayName(name: Column, house: Column, road: Column, suburb: Column,
                     city: Column, county: Column, state: Column, region: Column,
                     postcode: Column, country: Column): Column =
    concat_ws(", ", name, house, road, suburb, city, county, state, region,
      postcode, country)

  /** OpenCage-style `formatted` (/root/reference/src/opencage.rs:527,716-737):
    * address rows -> "Road, House, Postcode City, Country";
    * place rows    -> "Name, City, Country". */
  def opencageFormatted(name: Column, house: Column, road: Column,
                        postcode: Column, city: Column, country: Column): Column =
    when(road.isNotNull,
      concat_ws(", ",
        when(name =!= concat_ws(" ", road, house), name), // venue name if distinct
        road, house,
        when(postcode.isNotNull, concat_ws(" ", postcode, city)).otherwise(city),
        country))
      .otherwise(concat_ws(", ", name, when(city =!= name, city), country))

  /** GeoAdmin search label: "Name <b>postcode city</b>"
    * (fixture /root/reference/src/geoadmin.rs:471: label =
    * "Seftigenstrasse 264 <b>3084 Wabern</b>"). */
  def geoAdminLabel(name: Column, postcode: Column, city: Column): Column =
    concat(name, lit(" <b>"), postcode, lit(" "), city, lit("</b>"))

  /** GeoAdmin reverse format "{strname_deinr}, {dplz4} {dplzname}"
    * (/root/reference/src/geoadmin.rs:297-300). */
  def geoAdminReverse(strnameDeinr: Column, dplz4: Column, dplzname: Column): Column =
    concat(strnameDeinr, lit(", "), dplz4.cast("string"), lit(" "), dplzname)
}
