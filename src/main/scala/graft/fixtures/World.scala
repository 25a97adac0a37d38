package graft.fixtures

import graft.geo.CellIndex
import graft.model.{AdminPolygon, GazetteerRow}

/**
 * Deterministic micro-world: gazetteer + admin polygons seeded with exactly
 * the places from the reference's own mocked test fixtures (FIXTURES.md §3),
 * plus seeded filler for join volume. seed=42, no wall clock, no network.
 *
 * Golden inputs covered (reference file:line in FIXTURES.md):
 *  - Schwabing, München (openstreetmap.rs:395-408, opencage.rs:761-780)
 *  - UCL Centre for Advanced Spatial Analysis (openstreetmap.rs:410-437, opencage.rs:803-905)
 *  - Carrer de Calatrava 64, Barcelona (openstreetmap.rs:454-475, opencage.rs:716-801)
 *  - Moabit, Berlin, Germany (opencage.rs:907-920)
 *  - Seftigenstrasse 264, 3084 Wabern (geoadmin.rs:517-678)
 */
object World {

  private def gaz(id: Long, name: String, keys: Seq[String], lon: Double, lat: Double,
                  fc: String, cc: String, admin1: String = null, admin2: String = null,
                  city: String = null, suburb: String = null, road: String = null,
                  house: String = null, postcode: String = null, rank: Int = 20,
                  importance: Double = 0.5, weight: Int = 100,
                  alt: Map[String, String] = Map.empty, tz: String = null): GazetteerRow =
    GazetteerRow(id, name, keys, alt, lon, lat, fc, cc, admin1, admin2, city,
      suburb, road, house, postcode, rank, importance, weight,
      if (tz != null) tz
      else graft.engine.Format.countries.get(cc).map(_.timezone).orNull)

  val fixturePlaces: Seq[GazetteerRow] = Seq(
    gaz(1001, "Schwabing", Seq("schwabing munchen", "schwabing"),
      11.5884858, 48.1700887, "gazetteer", "de",
      admin1 = "Bayern", city = "München", suburb = "Schwabing",
      rank = 20, importance = 0.66, weight = 400,
      alt = Map("de" -> "Schwabing")),
    gaz(1002, "UCL Centre for Advanced Spatial Analysis",
      Seq("ucl centre for advanced spatial analysis", "ucl casa"),
      -0.1361, 51.5215, "address", "gb",
      admin1 = "England", city = "London", suburb = "Fitzrovia",
      road = "Tottenham Court Road", house = "90", postcode = "W1T 4TJ",
      rank = 30, importance = 0.41, weight = 200),
    gaz(1003, "Moabit", Seq("moabit berlin germany", "moabit berlin", "moabit"),
      13.34, 52.53, "gazetteer", "de",
      admin1 = "Berlin", city = "Berlin", suburb = "Moabit",
      rank = 20, importance = 0.6, weight = 300),
    gaz(1004, "Seftigenstrasse 264",
      Seq("seftigenstrasse 264 3084 wabern", "seftigenstrasse bern", "seftigenstrasse 264"),
      7.451352119445801, 46.92793655395508, "address", "ch",
      admin1 = "Bern", city = "Wabern", road = "Seftigenstrasse",
      house = "264", postcode = "3084", rank = 30, importance = 0.3, weight = 1000),
    gaz(1005, "Barcelona", Seq("barcelona"),
      2.17, 41.387, "gazetteer", "es",
      admin1 = "Catalunya", admin2 = "Barcelona", city = "Barcelona",
      rank = 16, importance = 0.85, weight = 800,
      alt = Map("fr" -> "Barcelone", "es" -> "Barcelona")),
    gaz(1006, "Carrer de Calatrava 64",
      Seq("carrer de calatrava 64 barcelona", "carrer de calatrava 64"),
      2.12870, 41.40139, "address", "es",
      admin1 = "Catalunya", admin2 = "Barcelona", city = "Barcelona",
      suburb = "Sarrià - Sant Gervasi", road = "Carrer de Calatrava",
      house = "64", postcode = "08017", rank = 30, importance = 0.2, weight = 500),
    // multi-timezone-country pair: country-level tz lookup gets one of these
    // WRONG; the cell->tz index must resolve both (TimezoneSpec)
    gaz(1007, "Los Angeles", Seq("los angeles"), -118.2437, 34.0522,
      "gazetteer", "us", admin1 = "California", city = "Los Angeles",
      rank = 12, importance = 0.9, weight = 900, tz = "America/Los_Angeles"),
    gaz(1008, "New York", Seq("new york", "new york city"), -74.0060, 40.7128,
      "gazetteer", "us", admin1 = "New York", city = "New York",
      rank = 12, importance = 0.95, weight = 950, tz = "America/New_York")
  )

  /** Seeded filler places for join volume; deterministic (no RNG state shared
    * across rows — pure function of i). */
  def fillerPlaces(n: Int): Seq[GazetteerRow] = (0 until n).map { i =>
    val lon = -170.0 + (i * 97 % 340) + 0.123
    val lat = -80.0 + (i * 53 % 160) + 0.456
    val cc = Seq("us", "de", "fr", "es", "it", "gb", "ch", "jp", "br", "au")(i % 10)
    gaz(2000L + i, s"Fillerton $i", Seq(s"fillerton $i"), lon, lat,
      if (i % 3 == 0) "address" else "gazetteer", cc,
      city = s"Fillerton $i", rank = 18 + (i % 12),
      importance = 0.1 + (i % 10) / 20.0, weight = 10 + i % 90)
  }

  def gazetteer(filler: Int = 44): Seq[GazetteerRow] = fixturePlaces ++ fillerPlaces(filler)

  /** Coarse-cell -> IANA timezone index from the gazetteer's per-place zones
    * (GeoNames carries one per place). Deterministic: lowest place_id wins a
    * contested cell. At world scale this is a broadcast table keyed by cell7
    * (~100k populated coarse cells globally — well under broadcast budget);
    * at fixture scale it folds into a literal map column. */
  def timezoneByCell7(rows: Seq[GazetteerRow] = gazetteer()): Map[Long, String] =
    rows.filter(_.timezone != null)
      .sortBy(_.place_id)
      .map(r => CellIndex.parent(
        CellIndex.encode(r.lon, r.lat, CellIndex.FineLevel), CellIndex.CoarseLevel) -> r.timezone)
      .foldLeft(Map.empty[Long, String]) { (m, kv) =>
        if (m.contains(kv._1)) m else m + kv }

  // ---- polygons --------------------------------------------------------------

  /** Convex quad centred at (lon, lat) with half-width dLon/dLat degrees,
    * CCW ring, plus covering cells at level 13. */
  private def quad(id: Long, name: String, level: Int, cc: String,
                   lon: Double, lat: Double, dLon: Double, dLat: Double,
                   house: String = null, road: String = null, suburb: String = null,
                   city: String = null, county: String = null, state: String = null,
                   region: String = null, postcode: String = null, country: String = null,
                   locCity: Map[String, String] = Map.empty,
                   locCountry: Map[String, String] = Map.empty,
                   dplz4: Int = 0, dplzname: String = null,
                   strnameDeinr: String = null): AdminPolygon = {
    val lons = Seq(lon - dLon, lon + dLon, lon + dLon, lon - dLon)
    val lats = Seq(lat - dLat, lat - dLat, lat + dLat, lat + dLat)
    val cells = CellIndex.coverBbox(lon - dLon, lat - dLat, lon + dLon, lat + dLat,
      CellIndex.FineLevel).toSeq
    AdminPolygon(id, name, level, cc, Seq(0, 4), lons, lats,
      lon - dLon, lat - dLat, lon + dLon, lat + dLat, cells,
      house, road, suburb, city, county, state, region, postcode, country,
      locCity, locCountry, dplz4, dplzname, strnameDeinr)
  }

  val fixturePolygons: Seq[AdminPolygon] = Seq(
    // building block around Carrer de Calatrava 64 — reverse fixtures
    // oc_reverse / oc_reverse_fr / osm_reverse target (2.12870, 41.40139)
    quad(5001, "Carrer de Calatrava 64", 10, "es", 2.12870, 41.40139, 0.0008, 0.0008,
      house = "64", road = "Carrer de Calatrava", suburb = "Sarrià - Sant Gervasi",
      city = "Barcelona", county = "Barcelonès", state = "Barcelona",
      region = "Catalunya", postcode = "08017", country = "Spain",
      locCity = Map("fr" -> "Barcelone", "es" -> "Barcelona"),
      locCountry = Map("fr" -> "Espagne", "es" -> "España"),
      dplz4 = 8017, dplzname = "Barcelona", strnameDeinr = "Carrer de Calatrava 64"),
    // Barcelona city polygon (less specific; specificity ordering must prefer
    // the building above for the fixture point)
    quad(5002, "Barcelona", 4, "es", 2.15, 41.39, 0.12, 0.08,
      city = "Barcelona", county = "Barcelonès", state = "Barcelona",
      region = "Catalunya", country = "Spain",
      locCity = Map("fr" -> "Barcelone"), locCountry = Map("fr" -> "Espagne")),
    // Wabern building — ga_reverse target (7.451352119445801, 46.92793655395508)
    quad(5003, "Seftigenstrasse 264", 10, "ch",
      7.451352119445801, 46.92793655395508, 0.0008, 0.0008,
      house = "264", road = "Seftigenstrasse", city = "Wabern",
      state = "Bern", postcode = "3084", country = "Switzerland",
      dplz4 = 3084, dplzname = "Wabern", strnameDeinr = "Seftigenstrasse 264"),
    quad(5004, "Schwabing", 6, "de", 11.5884858, 48.1700887, 0.02, 0.015,
      suburb = "Schwabing", city = "München", state = "Bayern",
      country = "Germany", locCity = Map("de" -> "München")),
    quad(5005, "Moabit", 6, "de", 13.34, 52.53, 0.02, 0.015,
      suburb = "Moabit", city = "Berlin", state = "Berlin", country = "Germany"),
    quad(5006, "Fitzrovia", 6, "gb", -0.1361, 51.5215, 0.01, 0.008,
      suburb = "Fitzrovia", city = "London", state = "England",
      country = "United Kingdom")
  )

  /** Multi-ring polygon from explicit rings (first = outer boundary, rest =
    * holes or islands under the even-odd rule). Covering cells from the
    * outer ring's bbox. */
  def ringsPoly(id: Long, name: String, level: Int, cc: String,
                rings: Seq[(Seq[Double], Seq[Double])],
                city: String = null, country: String = null): AdminPolygon = {
    val offsets = rings.scanLeft(0)((acc, r) => acc + r._1.size)
    val lons = rings.flatMap(_._1)
    val lats = rings.flatMap(_._2)
    val (oLons, oLats) = rings.head
    val cells = CellIndex.coverBbox(oLons.min, oLats.min, oLons.max, oLats.max,
      CellIndex.FineLevel).toSeq
    AdminPolygon(id, name, level, cc, offsets, lons, lats,
      oLons.min, oLats.min, oLons.max, oLats.max, cells,
      null, null, null, city, null, null, null, null, country,
      Map.empty, Map.empty, 0, null, null)
  }

  /** Filler polygons for volume; every third is a MULTI-RING donut (outer
    * quad + hole) so the world-scale bench and the reverse path exercise the
    * even-odd holes branch, like real admin boundaries (enclaves). */
  def fillerPolygons(n: Int): Seq[AdminPolygon] = (0 until n).map { i =>
    val lon = -160.0 + (i * 37 % 320) + 0.5
    val lat = -70.0 + (i * 23 % 140) + 0.5
    if (i % 3 == 2) {
      val (dLon, dLat) = (0.3, 0.2)
      val (hLon, hLat) = (0.1, 0.07)
      ringsPoly(6000L + i, s"Fillerland $i", 4, "us", Seq(
        (Seq(lon - dLon, lon + dLon, lon + dLon, lon - dLon),
         Seq(lat - dLat, lat - dLat, lat + dLat, lat + dLat)),
        (Seq(lon - hLon, lon + hLon, lon + hLon, lon - hLon),
         Seq(lat - hLat, lat - hLat, lat + hLat, lat + hLat))),
        city = s"Fillerland $i", country = "United States")
    } else
      quad(6000L + i, s"Fillerland $i", 4, "us", lon, lat, 0.3, 0.2,
        city = s"Fillerland $i", country = "United States")
  }

  def polygons(filler: Int = 6): Seq[AdminPolygon] = fixturePolygons ++ fillerPolygons(filler)
}
