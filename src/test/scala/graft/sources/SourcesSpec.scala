package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("CsvSource detects UTF-8 vs windows-1252 and reads both") {
    val utf8 = Files.createTempFile("utf8", ".csv")
    Files.write(utf8, "name,city\nAimé,Kigali\n".getBytes(StandardCharsets.UTF_8))
    val cp1252 = Files.createTempFile("cp1252", ".csv")
    Files.write(cp1252, "name,city\nAimé,Kigali\n".getBytes(Charset.forName("windows-1252")))

    assert(CsvSource.detectEncoding(utf8.toString) == "UTF-8")
    assert(CsvSource.detectEncoding(cp1252.toString) == "windows-1252")
    val a = CsvSource.read(spark, utf8.toString).collect().head.getString(0)
    val b = CsvSource.read(spark, cp1252.toString).collect().head.getString(0)
    assert(a == "Aimé" && b == "Aimé") // same text from both encodings
  }

  test("CsvSource detects BOMs and BOM-less UTF-16; all variants read identically") {
    // CRLF + accented chars: the Windows/Excel export shape the
    // reference's chardet+pd.read_csv path accepts
    // (health_center_lab__data_upload_views.py:60-70)
    val body = "name,age\r\nAmélie,31\r\nBjörn,42\r\n"
    def file(bytes: Array[Byte]): String = {
      val p = Files.createTempFile("enc", ".csv"); Files.write(p, bytes); p.toString
    }
    val variants = Seq(
      "UTF-8" -> file(body.getBytes(StandardCharsets.UTF_8)),
      "UTF-8" -> file(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        body.getBytes(StandardCharsets.UTF_8)),
      "UTF-16LE" -> file(Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        body.getBytes("UTF-16LE")),
      "UTF-16BE" -> file(Array[Byte](0xFE.toByte, 0xFF.toByte) ++
        body.getBytes("UTF-16BE")),
      "UTF-16LE" -> file(body.getBytes("UTF-16LE")), // BOM-less: NUL probe
      "UTF-16BE" -> file(body.getBytes("UTF-16BE")),
      "UTF-32LE" -> file(Array[Byte](0xFF.toByte, 0xFE.toByte, 0, 0) ++
        body.getBytes("UTF-32LE")),
      "UTF-32BE" -> file(Array[Byte](0, 0, 0xFE.toByte, 0xFF.toByte) ++
        body.getBytes("UTF-32BE")),
      // BOM-less UTF-32: the structural probe (top byte of every code
      // point is 0) must claim these BEFORE the UTF-16 parity test —
      // an ASCII-heavy UTF-32 file passes the parity test and would
      // otherwise transcode as valid-but-NUL-interleaved UTF-16 (NUL is
      // a legal code point, so even a REPORTing decoder stays silent)
      "UTF-32LE" -> file(body.getBytes("UTF-32LE")),
      "UTF-32BE" -> file(body.getBytes("UTF-32BE")))
    variants.foreach { case (expected, path) =>
      assert(CsvSource.detectEncoding(path) == expected, s"detect($path)")
      val df = CsvSource.read(spark, path, inferSchema = false)
      // header clean (no BOM residue), values exact (no \r tail, no
      // replacement chars, no NUL interleave)
      assert(df.columns.toSeq == Seq("name", "age"), s"columns($expected)")
      assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("Amélie", "31"), ("Björn", "42")), s"rows($expected, $path)")
    }
  }

  test("CsvSource detects Shift_JIS, EUC-JP and GBK structurally; Latin ladder unchanged") {
    def file(bytes: Array[Byte]): String = {
      val p = Files.createTempFile("cjk", ".csv"); Files.write(p, bytes); p.toString
    }
    // Japanese prose (kana-bearing — particles/okurigana, as real text is)
    val ja = "名前,都市\nこんにちは世界です,東京の会社\nありがとうございます,大阪の学校\n"
    // Chinese prose (hanzi-dense, no kana)
    val zh = "名字,城市\n你好世界欢迎光临,北京的公司\n非常感谢大家支持,上海的学校\n"
    val sjisPath = file(ja.getBytes("Shift_JIS"))
    val eucPath = file(ja.getBytes("EUC-JP"))
    val gbkPath = file(zh.getBytes("GBK"))
    assert(CsvSource.detectEncoding(sjisPath) == "Shift_JIS")
    // same Japanese text in EUC-JP: Shift_JIS strict decode fails on EUC
    // leads, the kana gate claims EUC-JP BEFORE GBK can read the shared
    // 94x94 kana rows as its own
    assert(CsvSource.detectEncoding(eucPath) == "EUC-JP")
    assert(CsvSource.detectEncoding(gbkPath) == "GBK")
    // both ingest to the same rows a UTF-8 ingest of the same text gives
    val viaUtf8Ja = CsvSource.read(spark, file(ja.getBytes(StandardCharsets.UTF_8)),
      inferSchema = false).collect().map(_.toSeq).toSeq
    val viaSjis = CsvSource.read(spark, sjisPath, inferSchema = false)
      .collect().map(_.toSeq).toSeq
    assert(viaSjis == viaUtf8Ja)
    val viaEuc = CsvSource.read(spark, eucPath, inferSchema = false)
      .collect().map(_.toSeq).toSeq
    assert(viaEuc == viaUtf8Ja)
    val viaUtf8Zh = CsvSource.read(spark, file(zh.getBytes(StandardCharsets.UTF_8)),
      inferSchema = false).collect().map(_.toSeq).toSeq
    val viaGbk = CsvSource.read(spark, gbkPath, inferSchema = false)
      .collect().map(_.toSeq).toSeq
    assert(viaGbk == viaUtf8Zh)
    // the CJK probe must NOT claim accent-dense Latin text: cp1252 bytes
    // like 0xE9+ASCII break Shift_JIS/GBK strict decode or stay far
    // under the kana/hanzi density gates
    val fr = "nom,ville\nAimé Côté,Kigali\nRenée Müller,Huyé\n"
    assert(CsvSource.detectEncoding(file(fr.getBytes(Charset.forName("windows-1252"))))
      == "windows-1252")
  }

  test("CsvSource detects EUC-KR by the hangul gate, probed before GBK") {
    def file(bytes: Array[Byte]): String = {
      val p = Files.createTempFile("euckr", ".csv"); Files.write(p, bytes); p.toString
    }
    // Korean prose: precomposed hangul syllables, hanja-free — the shape
    // real Korean exports have
    val ko = "이름,도시\n안녕하세요 세계 여러분,서울의 회사\n감사합니다 고맙습니다,부산의 학교\n"
    val koPath = file(ko.getBytes("EUC-KR"))
    // the ORDER is the claim: these hangul bytes strict-decode under GBK
    // as hanzi-dense text (verified in CsvSource's scaladoc), so a
    // GBK-first probe would misdetect — EUC-KR must win first
    assert(CsvSource.detectEncoding(koPath) == "EUC-KR")
    val viaUtf8 = CsvSource.read(spark, file(ko.getBytes(StandardCharsets.UTF_8)),
      inferSchema = false).collect().map(_.toSeq).toSeq
    val viaEucKr = CsvSource.read(spark, koPath, inferSchema = false)
      .collect().map(_.toSeq).toSeq
    assert(viaEucKr == viaUtf8)
    // the Japanese gates stay ahead of EUC-KR: EUC-JP kana rows decode
    // under EUC-KR as compatibility jamo, never syllables, so Japanese
    // text cannot be claimed by the hangul gate even if probed
    val ja = "名前,都市\nこんにちは世界です,東京の会社\nありがとうございます,大阪の学校\n"
    assert(CsvSource.detectEncoding(file(ja.getBytes("EUC-JP"))) == "EUC-JP")
    // Chinese stays GBK: these GBK bytes hit KS X 1001 unassigned rows
    // (strict EUC-KR fail) or would fail the hanja-sparse gate
    val zh = "名字,城市\n你好世界欢迎光临,北京的公司\n非常感谢大家支持,上海的学校\n"
    assert(CsvSource.detectEncoding(file(zh.getBytes("GBK"))) == "GBK")
    // KOI8-R is claimed by the Cyrillic rung as of r17 — see the
    // dedicated Cyrillic spec below
    val ru = "имя,город\nАнна,Москва\n"
    assert(CsvSource.detectEncoding(file(ru.getBytes("KOI8-R"))) == "KOI8-R")
  }

  test("CsvSource detects KOI8-R vs windows-1251 by density + prose case shape") {
    def file(bytes: Array[Byte]): String = {
      val p = Files.createTempFile("cyr", ".csv"); Files.write(p, bytes); p.toString
    }
    // Russian prose — mostly lowercase, the shape real exports have.
    // KOI8-R and cp1251 have byte-REVERSED case planes, so the wrong
    // decode reads as mostly-uppercase and fails the case gate: the same
    // text must round out to its own charset from both encodings.
    val ru = "имя,город\nАнна Петрова,Москва\nИван Сидоров,Санкт-Петербург\n"
    val koiPath = file(ru.getBytes("KOI8-R"))
    val cp1251Path = file(ru.getBytes("windows-1251"))
    assert(CsvSource.detectEncoding(koiPath) == "KOI8-R")
    assert(CsvSource.detectEncoding(cp1251Path) == "windows-1251")
    // both ingest to the same rows a UTF-8 ingest gives
    val viaUtf8 = CsvSource.read(spark, file(ru.getBytes(StandardCharsets.UTF_8)),
      inferSchema = false).collect().map(_.toSeq).toSeq
    assert(CsvSource.read(spark, koiPath, inferSchema = false)
      .collect().map(_.toSeq).toSeq == viaUtf8)
    assert(CsvSource.read(spark, cp1251Path, inferSchema = false)
      .collect().map(_.toSeq).toSeq == viaUtf8)
    // ISO-8859-5 / cp866 / MacCyrillic: the max-lowercase election picks
    // the genuine charset — a wrong candidate only reads the subset of
    // letters overlapping its own lowercase plane (ISO-8859-5 Russian
    // leans on а-п, which KOI8-R also reads as lowercase; the genuine
    // decode strictly beats it by the р-я letters)
    assert(CsvSource.detectEncoding(file(ru.getBytes("ISO-8859-5"))) == "ISO-8859-5")
    assert(CsvSource.detectEncoding(file(ru.getBytes("IBM866"))) == "IBM866")
    assert(CsvSource.detectEncoding(file(ru.getBytes("x-MacCyrillic"))) == "x-MacCyrillic")
    for (cs <- Seq("ISO-8859-5", "IBM866", "x-MacCyrillic"))
      assert(CsvSource.read(spark, file(ru.getBytes(cs)), inferSchema = false)
        .collect().map(_.toSeq).toSeq == viaUtf8, s"round-trip via $cs")
    // ALL-CAPS Cyrillic: KOI8-R's uppercase plane (E0-FF) is byte-for-
    // byte cp1251's LOWERCASE plane, so an all-caps KOI8-R file is
    // indistinguishable — identical bytes — from legitimate lowercase
    // cp1251 prose. No detector can split identical bytes; the pinned
    // deterministic outcome is the mirror charset (cyrillicProbe doc)
    val caps = "ИМЯ,ГОРОД\nАННА,МОСКВА\nИВАН,ТВЕРЬ\n"
    assert(CsvSource.detectEncoding(file(caps.getBytes("KOI8-R"))) == "windows-1251")
    // accent-sparse Latin text can never reach Cyrillic density: the
    // cp1252 ladder keeps it (the fr fixture of the CJK spec, re-pinned
    // here against the new rung)
    val fr = "nom,ville\nAimé Côté,Kigali\nRenée Müller,Huyé\n"
    assert(CsvSource.detectEncoding(file(fr.getBytes(Charset.forName("windows-1252"))))
      == "windows-1252")
    // the GBK election: Cyrillic whose letter runs are ALL even-length
    // forms valid GBK pairs (hanzi-dense reading!) — the genuine reading
    // has ~2 letters per fake pair and must win the count election
    val evenRuns = "ид,мера\nмосква привет,москва привет\n" +
      "москва привет,москва привет\n"
    assert(evenRuns.split("[^а-яё]+").filter(_.nonEmpty).forall(_.length % 2 == 0),
      "fixture drifted: every Cyrillic run must be even-length")
    assert(CsvSource.detectEncoding(file(evenRuns.getBytes("KOI8-R"))) == "KOI8-R")
    // ...and genuine Chinese is NEVER contested: its byte spread decodes
    // mixed-case under every Cyrillic candidate (prose-case gate fails)
    val zh2 = "名字,城市\n你好世界欢迎光临,北京的公司\n非常感谢大家支持,上海的学校\n"
    assert(CsvSource.detectEncoding(file(zh2.getBytes("GBK"))) == "GBK")
  }

  test("CsvSource ambiguous hanja band (2-5%) prefers GBK when GBK reads denser") {
    def file(bytes: Array[Byte]): String = {
      val p = Files.createTempFile("band", ".csv"); Files.write(p, bytes); p.toString
    }
    // ADVICE r16's named residue: GB2312-pure Chinese whose pairs all
    // land in KS X 1001 hangul rows (leads B0-C8) plus light hanja-row
    // usage (lead CA) strict-decodes under EUC-KR as hangul-dense text
    // with hanja in [2%, 5%) — the band where order alone misdetected it
    // as EUC-KR. Synthetic pair soup: the claim is band ARITHMETIC, not
    // any particular sentence.
    val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    buf ++= "a,b\n".getBytes("US-ASCII")
    for (i <- 0 until 96) {
      buf += (0xB0 + (i % 25)).toByte // leads B0..C8 (hangul rows)
      buf += (0xA1 + (i % 80)).toByte // trails A1..F0 (assigned both ways)
    }
    for (i <- 0 until 4) { buf += 0xCA.toByte; buf += (0xA1 + i).toByte }
    val bytes = buf.toArray
    // sanity: the fixture really sits in the ambiguous band under EUC-KR
    val s = new String(bytes, Charset.forName("EUC-KR"))
    val hangul = s.count(c => c >= 0xAC00 && c <= 0xD7A3)
    val hanja = s.count(c =>
      (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF))
    assert(hangul >= 8 && hangul.toLong * 7 >= s.length, "fixture must be hangul-dense")
    assert(hanja.toLong * 50 >= s.length && hanja.toLong * 20 < s.length,
      s"fixture must sit in the 2-5% hanja band (hanja=$hanja len=${s.length})")
    // under GBK every pair is a hanzi (100 > 96 hangul) → GBK wins now
    assert(CsvSource.detectEncoding(file(bytes)) == "GBK")
    // near-zero-hanja Korean is UNAFFECTED: one hanja over long prose
    // stays under 2% and claims EUC-KR without consulting GBK
    val ko = "이름,도시\n안녕하세요 세계 여러분 오늘도 좋은 하루 되세요," +
      "서울의 회사 家\n감사합니다 고맙습니다 반갑습니다,부산의 큰 학교\n"
    assert(ko.count(c => c >= 0x4E00 && c <= 0x9FFF) == 1 &&
      ko.length > 50, "fixture drifted: needs exactly one hanja and <2% density")
    assert(CsvSource.detectEncoding(file(ko.getBytes("EUC-KR"))) == "EUC-KR")
    // the documented trade (cjkProbe scaladoc): Korean prose whose hanja
    // usage lands INSIDE the band now reads as GBK — structure cannot
    // split 3%-hanja Korean from 3%-hanja-row Chinese, and the band's
    // likelier occupant is the Chinese mojibake path ADVICE r16 flagged
    val koBand = "이름,도시\n안녕하세요 世 여러분 오늘도 좋은 하루,서울 家 회사\n" +
      "감사합니다 고맙습니다,부산의 학교\n"
    val sBand = koBand
    val bandHanja = sBand.count(c => c >= 0x4E00 && c <= 0x9FFF)
    assert(bandHanja.toLong * 50 >= sBand.length && bandHanja.toLong * 20 < sBand.length,
      "fixture drifted out of the 2-5% band")
    assert(CsvSource.detectEncoding(file(koBand.getBytes("EUC-KR"))) == "GBK")
  }

  test("CsvSource: mis-detected wide file fails loudly, not as U+FFFD rows") {
    // valid UTF-16LE text has no decoder under UTF-16BE at the surrogate
    // gap rarely — instead craft a truncated (odd-length) UTF-16 payload:
    // the final lone byte is malformed under any UTF-16 decoder
    val p = Files.createTempFile("trunc", ".csv")
    Files.write(p, ("a,b\r\nx,y\r\n".getBytes("UTF-16LE") :+ 0x41.toByte))
    intercept[Exception] {
      CsvSource.decodeRecords(p, "UTF-16LE")
    }
  }

  test("CsvSource: driver-decode path is size-gated loudly") {
    // sparse file over the ceiling: the gate must fire on Files.size
    // BEFORE any byte is decoded, with the ceiling named in the message
    val p = Files.createTempFile("huge", ".csv")
    val raf = new java.io.RandomAccessFile(p.toFile, "rw")
    try raf.setLength(CsvSource.MaxDriverDecodeBytes + 1) finally raf.close()
    val e = intercept[IllegalArgumentException] {
      CsvSource.decodeRecords(p, "UTF-16LE")
    }
    assert(e.getMessage.contains("decode ceiling"))
    Files.delete(p)
  }

  test("CsvSource.read never mutates session conf (legacy.javaCharsets)") {
    // windows-1252 is outside Spark 4's CSV charset whitelist; the read
    // must decode driver-side instead of flipping the session-wide
    // legacy flag as a side effect (round-14 verdict hygiene item)
    spark.conf.unset("spark.sql.legacy.javaCharsets")
    val p = Files.createTempFile("cp1252b", ".csv")
    Files.write(p, "name,city\nAimé,Kigali\n".getBytes(Charset.forName("windows-1252")))
    val df = CsvSource.read(spark, p.toString)
    assert(df.collect().head.getString(0) == "Aimé")
    // unset → the registered default ("false"); a read that flipped the
    // session flag would leave "true" here
    assert(spark.conf.get("spark.sql.legacy.javaCharsets") == "false")
  }

  test("GeoJson explodes FeatureCollections and reassembles them") {
    import spark.implicits._
    val fc =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]},
        | "properties":{"village":"V1","slope":"3.5"}},
        |{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[2.0,2.0],[3.0,2.0],[3.0,3.0],[2.0,2.0]]]},
        | "properties":{"village":"V2","slope":"12.0"}}]}""".stripMargin.replaceAll("\n", "")
    val features = GeoJson.explodeFeatures(Seq(fc).toDF("json"), "json")
    val rows = features.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("geometry_type") == "Polygon")
    assert(rows(0).getAs[Map[String, String]]("properties")("village") == "V1")
    // geometry lands in the graft.geo polygon encoding - area works on it
    val areas = features.select(graft.geo.GeoFunctions.stArea(col("geom")).as("a"))
      .as[Double].collect().toSeq
    assert(areas == Seq(0.5, 0.5))
    // round-trip back to a FeatureCollection
    val back = features.agg(GeoJson.toFeatureCollection(features.toDF(),
      col("geometry_type"), col("geom"), col("properties")).as("fc"))
      .as[String].head
    assert(back.contains("\"FeatureCollection\""))
    val reExploded = GeoJson.explodeFeatures(Seq(back).toDF("json"), "json").collect()
    assert(reExploded.length == 2)
    assert(reExploded.map(_.getAs[Map[String, String]]("properties")("village")).toSet
      == Set("V1", "V2"))
  }

  test("ShapefilePicker scores and selects the village-level candidate") {
    import ShapefilePicker._
    val adm1 = Candidate("/a/adm1.shp", "adm1.shp", Seq("PROV_NAME"), 30)
    val villages = Candidate("/a/Rwanda_Villages_adm4.shp", "Rwanda_Villages_adm4.shp",
      Seq("Village", "Code_vill"), 14000)
    val sectors = Candidate("/a/sectors.shp", "sectors.shp", Seq("Sect_ID1"), 400)
    // villages: keywords village(s)+adm4 (village,villages,adm4 = 30) + col 20 + count 5
    assert(score(villages) == 55)
    // sectors: keywords sector+sectors (20) + no name indicator match in Sect_ID1 + 5
    assert(score(sectors) == 25)
    assert(score(adm1) == 20) // no filename keyword; PROV_NAME contains 'name' -> +20
    assert(pick(Seq(adm1, sectors, villages)).get == villages)
    assert(pick(Nil).isEmpty)
  }

  test("villageNameColumn: reference scoring quirks, technical zero-out, fallbacks") {
    import ShapefilePicker._
    // exact 'village' (100) + partial (50) = 150 beats VILL_NAME's
    // partial 'vill_name' exact (100+50+20=170)? no: vill_name exact=100,
    // partial=50, 'name' +20 -> 170 wins
    assert(villageNameColumn(Seq("Village", "VILL_NAME")) === Some("VILL_NAME"))
    // a literal 'name' column: exact 100 + partial 50 + 'name' 20 = 170
    assert(villageNameColumn(Seq("name", "Village")) === Some("name"))
    // technical columns zero out AFTER the adds: 'geometry'/'id' never win
    assert(villageNameColumn(Seq("id", "geometry", "sector_id")) === Some("sector_id"))
    // first maximal wins on ties (Python max over insertion order)
    assert(villageNameColumn(Seq("cell_code", "sector_code")) === Some("cell_code"))
    // 'name' buried mid-word still scores via the main loop (+50 partial
    // +20 'name' — the reference's trailing fallback is unreachable for
    // any real column set, a quirk preserved as-is)
    assert(villageNameColumn(Seq("objectid", "RENAMED_X")) === Some("RENAMED_X"))
    assert(villageNameColumn(Seq("objectid", "shape")) === None)
    assert(villageNameColumn(Nil) === None)
  }
}
