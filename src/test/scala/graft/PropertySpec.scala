package graft

import graft.warc.{WarcReader, WarcRecord, WarcWriter}
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the hand-rolled core: the WARC scanner,
  * the ASCII tokenizer's regex contract, MinHash invariances, and the
  * sessionizer's reorder buffer vs a full-sort reference. ScalaCheck
  * generators driven directly (no scalatestplus bridge offline).
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](g: Gen[T], n: Int = 60)(body: T => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)


  // ---- WARC write→read round-trip ----

  private val headerKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map("X-" + _)
  private val headerVal: Gen[String] =
    Gen.listOf(Gen.choose(' ', '~')).map(_.mkString.trim).map(v => if (v.isEmpty) "v" else v)

  private val recordGen: Gen[WarcRecord] = for {
    n <- Gen.choose(0, 5)
    ks <- Gen.listOfN(n, headerKey)
    vs <- Gen.listOfN(n, headerVal)
    uri <- Gen.alphaNumStr.map(s => s"https://ex.test/$s")
    payload <- Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)
  } yield WarcRecord(
    Map("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
      "Content-Length" -> payload.length.toString) ++ ks.zip(vs).toMap,
    payload)

  test("WARC writer→reader round-trips arbitrary records") {
    forAll(Gen.listOfN(4, recordGen)) { recs =>
      val tmp = java.nio.file.Files.createTempFile("prop", ".warc.gz").toString
      WarcWriter.writeFile(tmp, recs)
      val back = WarcReader.open(tmp).toVector
      assert(back.length == recs.length)
      back.zip(recs).foreach { case (b, a) =>
        assert(b.targetUri == a.targetUri)
        assert(java.util.Arrays.equals(b.payload, a.payload))
        a.headers.foreach { case (k, v) =>
          if (!k.equalsIgnoreCase("Content-Length")) assert(b.headers.get(k).contains(v))
        }
      }
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
    }
  }

  // ---- tokenizer ≡ regex formulation on printable ASCII ----

  test("AsciiWordTokens ≡ regexp_extract_all(lower, '[a-z0-9]+') on ASCII") {
    val asciiText: Gen[String] = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      2 -> Gen.oneOf('.', ',', '!', '-', '_', '\t', '\n'))).map(_.mkString)
    forAll(asciiText) { s =>
      val native = {
        val arr = graft.functions.AsciiWordTokens.tokenize(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      }
      val regex = "[a-z0-9]+".r.findAllIn(s.toLowerCase).toSeq
      assert(native == regex)
    }
  }

  // ---- MinHash invariances ----

  test("MinHashSig is permutation-invariant and bin-correct") {
    val hashes: Gen[List[Long]] = Gen.nonEmptyListOf(Arbitrary.arbitrary[Long])
    forAll(hashes) { hs =>
      def sig(xs: Seq[Long]): Seq[Long] = {
        val a = graft.functions.HashKernels.minhash(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            xs.map(x => x: Any).toArray), 16)
        (0 until 16).map(a.getLong)
      }
      val s1 = sig(hs)
      assert(s1 == sig(scala.util.Random.shuffle(hs)))        // order-free
      assert(s1 == sig(hs ++ hs))                              // multiplicity-free
      // each non-empty bin holds the min of its residue class
      hs.groupBy(h => (((h % 16) + 16) % 16).toInt).foreach { case (bin, xs) =>
        assert(s1(bin) == xs.min)
      }
    }
  }

  // ---- sessionize reorder buffer ≡ full sort (via the state machine) ----

  test("session splits from a bounded reorder ≡ full-sort reference") {
    // timestamps bounded so the gap (1000ms) actually splits sometimes;
    // disorder within the generator list is unbounded, so feed the heap
    // a buffer as large as the list (the correctness contract; smaller
    // buffers only drop late-beyond-horizon events by design)
    val tsList: Gen[List[Long]] = Gen.nonEmptyListOf(Gen.choose(0L, 5000L))
    forAll(tsList) { ts =>
      val gap = 1000L
      def sessionsOf(sorted: Seq[Long]): Seq[Int] = {
        // reference: count events per gap-delimited session, in order
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var n = 0; var last = Long.MinValue
        sorted.foreach { t =>
          if (n > 0 && t - last > gap) { out += n; n = 0 }
          n += 1; last = t
        }
        if (n > 0) out += n
        out.toSeq
      }
      // the reorder buffer with capacity >= input must see the same
      // splits as a full sort
      val heap = new java.util.PriorityQueue[Long](ts.length max 1)
      ts.foreach(heap.add(_))
      val drained = Iterator.continually(heap.poll()).take(ts.length).toSeq
      assert(sessionsOf(drained) == sessionsOf(ts.sorted))
    }
  }

  // ---- MediaMeta container probes ----

  /** Build one MPEG1 Layer-III frame for (bitrateIdx, rateIdx). */
  private def mp3Frame(bitrateIdx: Int, rateIdx: Int): Array[Byte] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)(bitrateIdx)
    val rate = Array(44100, 48000, 32000)(rateIdx)
    val len = 1152 / 8 * kbps * 1000 / rate
    val f = new Array[Byte](len)
    f(0) = 0xff.toByte; f(1) = 0xfb.toByte
    f(2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte
    f
  }

  test("longWindowsAll ≡ per-window pack reference on arbitrary arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arrays: Gen[(List[Long], Int)] = for {
      xs <- Gen.listOf(Arbitrary.arbitrary[Long])
      w <- Gen.choose(1, 6)
    } yield (xs, w)
    forAll(arrays) { case (xs, w) =>
      val out = graft.functions.HashKernels
        .longWindowsAll(new GenericArrayData(xs.toArray), w)
      if (xs.length < w) assert(out.numElements() == 0)
      else {
        assert(out.numElements() == xs.length - w + 1)
        // reference: hash each window independently via the distinct
        // kernel on the exact w-slice (single window → its own hash)
        xs.sliding(w).zipWithIndex.foreach { case (win, i) =>
          val ref = graft.functions.HashKernels
            .longWindows(new GenericArrayData(win.toArray), w).getLong(0)
          assert(out.getLong(i) == ref, s"window $i of $xs w=$w")
        }
        // equal windows hash equal, and position order is preserved
        val vals = (0 until out.numElements()).map(out.getLong)
        xs.sliding(w).toSeq.zip(vals).groupBy(_._1).values.foreach { g =>
          assert(g.map(_._2).distinct.size == 1)
        }
      }
    }
  }

  test("mp3 probe recovers frame count and rate for any valid header combo") {
    val gen = for {
      bi <- Gen.choose(1, 14)
      ri <- Gen.choose(0, 2)
      n <- Gen.choose(2, 40)
    } yield (bi, ri, n)
    forAll(gen) { case (bi, ri, n) =>
      val bytes = Array.fill(n)(mp3Frame(bi, ri)).flatten.toArray
      val m = graft.media.MediaMeta.mp3Meta(bytes).get
      assert(m.frames == n)
      assert(m.sampleRate == Array(44100, 48000, 32000)(ri))
      assert(math.abs(m.durationS - n * 1152.0 / m.sampleRate) < 1e-3)
    }
  }

  test("probes never throw and reject arbitrary byte noise as container data") {
    forAll(Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)) { bytes =>
      // must not throw on any input; random noise virtually never parses
      // as >=2 consecutive valid MP3 frames / an Ogg+ident page / BMFF
      graft.media.MediaMeta.mp3Meta(bytes)
      graft.media.MediaMeta.oggMeta(bytes)
      graft.media.MediaMeta.mp4Meta(bytes)
    }
  }

  test("nfc_normalize is idempotent and length-stable-or-shrinking on arbitrary unicode") {
    val uni = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar,
      Gen.choose(0x00c0.toChar, 0x024f.toChar),   // Latin-1/Extended precomposed
      Gen.oneOf('\u0301', '\u0308', '\u030a'),   // combining marks
      Gen.oneOf('\u212b', '\u2126'),              // canonical singletons
      Gen.choose(0x3040.toChar, 0x30ff.toChar)    // kana (has canonical composites)
    )).map(_.mkString)
    forAll(uni) { raw =>
      val once = graft.functions.NfcNormalize
        .normalize(org.apache.spark.unsafe.types.UTF8String.fromString(raw)).toString
      val twice = graft.functions.NfcNormalize
        .normalize(org.apache.spark.unsafe.types.UTF8String.fromString(once)).toString
      assert(twice == once, s"not idempotent on ${raw.map(_.toInt.toHexString)}")
      assert(java.text.Normalizer.isNormalized(once, java.text.Normalizer.Form.NFC))
      assert(once.codePointCount(0, once.length) <= raw.codePointCount(0, raw.length),
        "NFC canonical composition never adds code points")
    }
  }
}
