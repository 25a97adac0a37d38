package graft.sources

/**
 * Deterministic provider-shaped JSON response bodies for the D4 contract row:
 * the same documents are parsed by Spark (`ProviderJson.parse*`, typed
 * `from_json` schemas) and independently by the oracle's JSON functions, so
 * the typed-decode path (D4) and its lenient coercions (S4 string-or-int,
 * S5 UnixTime, S6 camelCase + arrays, S7 header int) carry a direct
 * correctness row instead of scalatest-only coverage.
 *
 * Shapes mirror the reference's response structs (field names and nesting,
 * NOT the fixture values): Nominatim GeoJSON
 * /root/reference/src/openstreetmap.rs:284-347, OpenCage
 * /root/reference/src/opencage.rs:550-673 (components string-or-int
 * :73-88), GeoAdmin /root/reference/src/geoadmin.rs:357-446. All values are
 * synthesized arithmetically from (response, result) indices; decimals are
 * built from integers so the body text is exactly reproducible.
 *
 * Deliberate omissions exercise the Option-typed fields: every third
 * Nominatim feature has no address block, every fourth OpenCage response has
 * no rate header (the reference's "no X-RateLimit headers" case), every
 * second GeoAdmin forward hit has no house number, and responses with
 * i % 3 == 0 have EMPTY result arrays (the reverse "no panic on empty
 * response" case, openstreetmap.rs:192-201).
 */
object ProviderFixtures {

  private def nominatim(i: Int): String = {
    val feats = (0 until i % 3).map { j =>
      val addr =
        if ((i + j) % 3 != 0)
          s""","address":{"city":"Town ${(i + j) % 7}","postcode":"${1000 + i * 10 + j}","country_code":"de"}"""
        else ""
      s"""{"type":"Feature","properties":{"place_id":${100 + 10 * i + j},"osm_type":"node","osm_id":${500 + i + j},"display_name":"Place $i-$j, Town ${(i + j) % 7}, Testland","place_rank":${10 + (i + j) % 20},"category":"place","type":"suburb","importance":0.${40 + i * 3 + j}$addr},"bbox":[${7 + i}.${10 + j},${46 + i % 4}.${15 + j},${7 + i}.${90 + j},${46 + i % 4}.${95 + j}],"geometry":{"type":"Point","coordinates":[${7 + i}.${500 + j},${46 + i % 4}.${200 + j}]}}"""
    }
    s"""{"type":"FeatureCollection","licence":"Test Data Licence","features":[${feats.mkString(",")}]}"""
  }

  private def opencage(i: Int): String = {
    val rate = if (i % 4 != 1) s""""rate":{"limit":2500,"remaining":${2500 - i},"reset":1693526400},""" else ""
    val results = (0 until i % 3).map { j =>
      val bounds =
        if (j % 2 == 0)
          s""""bounds":{"northeast":{"lat":${41 + i % 3}.${40 + j},"lng":${2 + i % 5}.${20 + j}},"southwest":{"lat":${41 + i % 3}.${30 + j},"lng":${2 + i % 5}.${10 + j}}},"""
        else ""
      s"""{"annotations":{"timezone":"Europe/Zurich","geohash":"u0qj$i$j"},$bounds"components":{"_type":"city","city":"City ${(i + j) % 5}","postcode":${8000 + i * 10 + j},"country_code":"ch"},"confidence":${1 + (i + j) % 10},"formatted":"Formatted $i-$j, Testland","geometry":{"lat":${41 + i % 3}.${350 + j},"lng":${2 + i % 5}.${170 + j}}}"""
    }
    s"""{"documentation":"https://example.invalid/docs","status":{"message":"OK","code":200},${rate}"total_results":${i % 3},"timestamp":{"created_http":"Thu, 01 Jan 2026 00:00:00 GMT","created_unix":${1693500000 + i * 37}},"results":[${results.mkString(",")}]}"""
  }

  private def geoadminFwd(i: Int): String = {
    val results = (0 until i % 3).map { j =>
      val num = if (j % 2 == 0) s""""num":${100 + i},""" else ""
      s"""{"id":${3000 + i * 10 + j},"weight":${1 + (i + j) % 9},"attrs":{"origin":"${Seq("address", "gg25", "gazetteer")((i + j) % 3)}","geom_quadindex":"021$i$j","weight":${1 + (i + j) % 9},"rank":${1 + (i * 7 + j) % 12},"detail":"strasse $i ${260 + j} ort","lat":${46 + i % 2}.${920 + j},"lon":${7 + i % 3}.${450 + j},$num"x":6${i}0030.5,"y":1${j}1382.25,"label":"Strasse $i ${260 + j} <b>${3000 + i * 10 + j} Ort${(i + j) % 6}</b>","zoomlevel":10}}"""
    }
    s"""{"results":[${results.mkString(",")}]}"""
  }

  private def geoadminRev(i: Int): String = {
    val results = (0 until i % 3).map { j =>
      val strname =
        if (j == 1) s"""["Strasse $i","Rue $i"]""" else s"""["Strasse $i"]"""
      s"""{"featureId":"${1272000 + i * 10 + j}_0","layerBodId":"test.layer.${i % 3}","layerName":"Building addresses","properties":{"egid":"${1272000 + i * 10 + j}","ggdenr":${300 + i},"ggdename":"Gemeinde$i","gdekt":"BE","dplz4":${3000 + i * 10 + j},"dplzname":"Ort${(i + j) % 6}","strname":$strname,"strsp":["DE"],"strname_deinr":"Strasse $i ${260 + j}","label":"Strasse $i ${260 + j} <b>${3000 + i * 10 + j} Ort${(i + j) % 6}</b>"}}"""
    }
    s"""{"results":[${results.mkString(",")}]}"""
  }

  /** (provider, resp_id, body) rows — 12 responses per provider family. */
  def rows: Seq[(String, Long, String)] =
    (0 until 12).flatMap { i =>
      Seq(("nominatim", i.toLong, nominatim(i)),
        ("opencage", i.toLong, opencage(i)),
        ("geoadmin_fwd", i.toLong, geoadminFwd(i)),
        ("geoadmin_rev", i.toLong, geoadminRev(i)))
    }
}
