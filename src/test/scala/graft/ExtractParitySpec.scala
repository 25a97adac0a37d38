package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{DictScanner, Extract, Norm}
import graft.fixtures.Synth
import graft.model.Mention

/** The byte-level extraction hot path must produce exactly the string path's
  * output: same mentions, same order, same parsed coordinates — on fixture
  * texts, synthesized pages, and adversarial ASCII edge cases. Also pins the
  * DMS-literal extraction semantics (SURVEY §2.7 E2). */
class ExtractParitySpec extends AnyFunSuite {

  val scanner = graft.engine.Gazetteer.scanner()

  private def viaString(t: String) = Extract.extractAll(t, scanner).toSeq
  private def viaBytes(t: String) =
    Extract.extractAllBytes(t.getBytes(java.nio.charset.StandardCharsets.UTF_8), scanner).toSeq

  test("byte path == string path on all fixture texts and 500 synth pages") {
    Synth.fixtureTexts.foreach { t =>
      assert(viaBytes(t) === viaString(t), s"fixture: $t")
    }
    (0L until 500L).foreach { i =>
      val t = Synth.pageFor(i).text
      assert(viaBytes(t) === viaString(t), s"page $i")
    }
  }

  test("byte path == string path on ASCII edge cases") {
    val cases = Seq(
      "", " ", "-", "1.", "12.34", "123.4567, 89.1234", // regex backtracking: lat=23.4567
      "41.40139, 2.12870", "41.40139,2.12870", "41.40139,  \t2.12870",
      "-90.0001, 0.0001 out of range", "90.000, 180.000", "-12.345, -123.456",
      "9.123, 10.1234 tail 1.234, 5.678", "barcelona", "BARCELONA!",
      "near Schwabing, munchen and Barcelona", "fillerton 7 fillerton",
      "a1b2c3 41.123456, 2.654321 x", "....," , "1.2345, 2.3456",
      "12.3456, 123.45 too few decimals", "overlap 12.345678.123, 2.123456")
    cases.foreach { t =>
      assert(viaBytes(t) === viaString(t), s"case: [$t]")
    }
  }

  test("regex-equivalence property: random digit/punct soup") {
    val chars = "0123456789.,- aZ\t\n"
    def mix(i: Long) = {
      var z = i * 0x9E3779B97F4A7C15L + 11L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z ^ (z >>> 27)
    }
    (0 until 300).foreach { s =>
      val len = 5 + (mix(s) & 63L).toInt
      val t = (0 until len).map(i => chars(((mix(s * 1000 + i) >>> 8) % chars.length).toInt)).mkString
      assert(viaBytes(t) === viaString(t), s"soup: [$t]")
    }
  }

  test("DMS literals parse to the reference's DMS semantics (opencage.rs:442-445)") {
    val ms = viaString("Surveyors marked 41° 24' 5.006'' N 2° 7' 43.332'' E on the door.")
    val dms = ms.filter(m => m.kind == "coord")
    assert(dms.size === 1)
    val m = dms.head
    assert(math.abs(m.lat - (41.0 + 24.0 / 60 + 5.006 / 3600)) < 1e-12)
    assert(math.abs(m.lon - (2.0 + 7.0 / 60 + 43.332 / 3600)) < 1e-12)
    // hemisphere signs
    val s = viaString("at 33° 52' 4.0'' S 151° 12' 36.5'' E then 40° 41' 21.0'' N 74° 2' 40.2'' W done")
      .filter(_.kind == "coord")
    assert(s.size === 2)
    assert(s(0).lat < 0 && s(0).lon > 0)
    assert(s(1).lat > 0 && s(1).lon < 0)
    // round-trip with the engine's own DMS formatter
    val lat = 41.4013905
    val lon = 2.1287033
    val txt = s"pin ${graft.geo.Geo.dms(lat, isLat = true)} ${graft.geo.Geo.dms(lon, isLat = false)} end"
    val rt = viaString(txt).filter(_.kind == "coord")
    assert(rt.size === 1)
    assert(math.abs(rt.head.lat - lat) < 1e-8 && math.abs(rt.head.lon - lon) < 1e-8)
  }

  test("DMS fixture text flows through the extraction surface end to end") {
    val t = Synth.fixtureTexts(12)
    val ms: Seq[Mention] = viaString(t)
    assert(ms.exists(m => m.kind == "coord" && math.abs(m.lat - 41.40139) < 1e-4
      && math.abs(m.lon - 2.12870) < 1e-4))
  }

  test("offset-slice extraction equals whole-array extraction (zero-copy path)") {
    (Synth.fixtureTexts ++ (0L until 50L).map(Synth.pageFor(_).text)).foreach { t =>
      val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val padded = new Array[Byte](raw.length + 13)
      java.util.Arrays.fill(padded, '9'.toByte) // adversarial padding: digits
      System.arraycopy(raw, 0, padded, 7, raw.length)
      assert(Extract.extractAllBytes(padded, 7, raw.length, scanner).toSeq === viaBytes(t))
    }
  }

  test("hash-trie scan equals the normalized-token scan on mixed text") {
    val texts = Seq("go to schwabing munchen now", "ucl casa visit", "moabit berlin germany",
      "carrer de calatrava 64 barcelona", "nothing here", "fillerton 3 fillerton 12")
    texts.foreach { t =>
      val toks = Norm.tokens(t)
      assert(scanner.scanTokens(toks).toSeq === scanner.scan(toks.mkString(" ")).toSeq)
    }
  }
}
