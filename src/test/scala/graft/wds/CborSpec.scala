package graft.wds

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec

/** RFC 8949 codec laws + the S13 cbors shard source. */
class CborSpec extends SparkSpec {

  private def rt(v: Any): Any = Cbor.decode(Cbor.encode(v))

  test("scalar round-trips and int width edges") {
    assert(rt(0L) == 0L)
    assert(rt(23L) == 23L)
    assert(rt(24L) == 24L)
    assert(rt(255L) == 255L)
    assert(rt(256L) == 256L)
    assert(rt(65535L) == 65535L)
    assert(rt(65536L) == 65536L)
    assert(rt(4294967295L) == 4294967295L)
    assert(rt(4294967296L) == 4294967296L)
    assert(rt(Long.MaxValue) == Long.MaxValue)
    assert(rt(-1L) == -1L)
    assert(rt(-256L) == -256L)
    assert(rt(Long.MinValue) == Long.MinValue)
    assert(rt(true) == true && rt(false) == false)
    assert(rt(null) == null)
    assert(rt(3.25) == 3.25)
    assert(java.lang.Double.doubleToRawLongBits(
      rt(-0.0).asInstanceOf[Double]) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(rt("héllo ▁") == "héllo ▁")
    assert(rt("").==(""))
  }

  test("nested arrays/maps/bytes round-trip; map order preserved") {
    val v = Cbor.CborMap(Vector(
      "__key__" -> "000000001",
      "txt" -> "a caption",
      "bin" -> Array[Byte](1, 2, 3, 0, -1),
      "meta" -> Cbor.CborMap(Vector("w" -> 640L, "h" -> 360L)),
      "tags" -> Vector("a", "b", 7L)))
    val got = rt(v).asInstanceOf[Cbor.CborMap]
    assert(got.pairs.map(_._1) == v.pairs.map(_._1)) // order kept
    assert(Cbor.toMap(got)("txt") == "a caption")
    assert(got.pairs(2)._2.asInstanceOf[Array[Byte]].toSeq ==
      Seq[Byte](1, 2, 3, 0, -1))
    assert(Cbor.toMap(got.pairs(3)._2) == Map("w" -> 640L, "h" -> 360L))
    assert(got.pairs(4)._2 == Vector("a", "b", 7L))
  }

  test("full 64-bit integer range round-trips (beyond Long)") {
    val u64Max = (BigInt(1) << 64) - 1
    assert(rt(u64Max) == u64Max)
    assert(rt(BigInt(Long.MaxValue) + 1) == BigInt(Long.MaxValue) + 1)
    val negMin = -(BigInt(1) << 64)
    assert(rt(negMin) == negMin)
    assert(rt(BigInt(Long.MinValue) - 1) == BigInt(Long.MinValue) - 1)
    // a spec-valid map value above Long range survives toSample's
    // re-encode instead of crashing the task
    val s = CborReader.toSample(
      Cbor.decode(Cbor.encode(Cbor.CborMap(Vector(
        "__key__" -> "k", "size" -> u64Max)))), 0, "u")
    assert(Cbor.decode(s.entries("size")) == u64Max)
  }

  test("mid-stream corruption honors the handler policy per shard") {
    val dir = Files.createTempDirectory("cbors_bad").toString
    val good = new java.io.FileOutputStream(s"$dir/good.cbors")
    (0 until 3).foreach(i => Cbor.encode(
      Cbor.CborMap(Vector("__key__" -> s"g$i", "txt" -> "x")), good))
    good.close()
    // one complete item, then a truncated second item
    val bad = Cbor.encode(Cbor.CborMap(Vector("__key__" -> "b0"))) ++
      Cbor.encode(Cbor.CborMap(Vector("__key__" -> "b1",
        "txt" -> "truncated payload"))).dropRight(4)
    Files.write(java.nio.file.Paths.get(s"$dir/bad.cbors"), bad)
    // continue: complete items of the bad shard + the whole good shard
    val got = CborReader.readUrls(spark,
      Seq(s"$dir/bad.cbors", s"$dir/good.cbors"), Handler.WarnContinue)
      .collect().map(_.key).sorted.toSeq
    assert(got == Seq("b0", "g0", "g1", "g2"))
    // reraise: the truncation propagates
    assertThrows[org.apache.spark.SparkException](
      CborReader.readUrls(spark, Seq(s"$dir/bad.cbors")).collect())
    // stop: truncates the failing task's stream; shards in OTHER
    // partitions (one shard per partition here) are unaffected
    val stopped = CborReader.readUrls(spark,
      Seq(s"$dir/bad.cbors", s"$dir/good.cbors"), Handler.IgnoreStop)
      .collect().map(_.key).sorted.toSeq
    assert(stopped == Seq("b0", "g0", "g1", "g2"))
  }

  test("decodes indefinite-length strings/arrays/maps and tags") {
    // 0x5f = indefinite bstr, chunks "ab" "c"; 0xff break
    val bstr = Array[Byte](0x5f.toByte, 0x42, 'a', 'b', 0x41, 'c',
      0xff.toByte)
    assert(Cbor.decode(bstr).asInstanceOf[Array[Byte]].toSeq ==
      "abc".getBytes(UTF_8).toSeq)
    // 0x7f indefinite tstr
    val tstr = Array[Byte](0x7f.toByte, 0x62, 'h', 'i', 0x61, '!',
      0xff.toByte)
    assert(Cbor.decode(tstr) == "hi!")
    // 0x9f indefinite array [1, 2]; 0xbf indefinite map {"a": 1}
    assert(Cbor.decode(Array[Byte](0x9f.toByte, 1, 2, 0xff.toByte)) ==
      Vector(1L, 2L))
    assert(Cbor.toMap(Cbor.decode(Array[Byte](0xbf.toByte, 0x61, 'a', 1,
      0xff.toByte))) == Map("a" -> 1L))
    // tag 1 (epoch) is transparent: c1 1a 514b67b0
    assert(Cbor.decode(Array[Byte](0xc1.toByte, 0x1a,
      0x51, 0x4b, 0x67, 0xb0.toByte)) == 1363896240L)
    // half-precision float: f9 3c00 = 1.0
    assert(Cbor.decode(Array[Byte](0xf9.toByte, 0x3c, 0x00)) == 1.0)
  }

  test("decodeAll streams consecutive items; truncation raises") {
    val bytes = Cbor.encode("one") ++ Cbor.encode(2L) ++
      Cbor.encode(Vector(3L))
    assert(Cbor.decodeAll(new ByteArrayInputStream(bytes)).toList ==
      List("one", 2L, Vector(3L)))
    // truncated mid-item: EOF inside an item is an error, not clean end
    val trunc = Cbor.encode("payload").dropRight(2)
    assertThrows[java.io.EOFException](
      Cbor.decodeAll(new ByteArrayInputStream(trunc)).toList)
    // truncated at a NESTED item's head byte (array cut between
    // elements): must also raise, not read as a shorter clean stream
    val nested = (Cbor.encode(1L) ++ Cbor.encode(Vector(2L, 3L)))
      .dropRight(1)
    val ex = intercept[java.io.EOFException](
      Cbor.decodeAll(new ByteArrayInputStream(nested)).toList)
    assert(!ex.isInstanceOf[Cbor.EndOfStream])
  }

  test("cbors shard source: samples via __key__ convention + pipe:") {
    val dir = Files.createTempDirectory("cbors").toString
    (0 until 2).foreach { shard =>
      val out = new java.io.FileOutputStream(s"$dir/part-$shard.cbors")
      (0 until 3).foreach { i =>
        Cbor.encode(Cbor.CborMap(Vector(
          "__key__" -> f"${shard * 3 + i}%06d",
          "txt" -> s"doc $shard/$i",
          "bin" -> Array.fill(4)((shard * 16 + i).toByte))), out)
      }
      out.close()
    }
    val got = CborReader.read(spark, s"$dir/part-{0..1}.cbors")
      .collect().sortBy(_.key)
    assert(got.length == 6)
    assert(got.map(_.key).toSeq ==
      (0 until 6).map(i => f"$i%06d"))
    assert(new String(got(4).entries("txt"), UTF_8) == "doc 1/1")
    assert(got(0).entries.keySet == Set("txt", "bin"))
    // pipe: scheme composes with the cbors source
    val piped = CborReader.readUrls(spark,
      Seq(s"pipe:cat $dir/part-0.cbors")).collect()
    assert(piped.length == 3)
    // sample ops compose downstream (it is a normal Dataset[Sample])
    import SampleOps._
    val sel = CborReader.read(spark, s"$dir/part-{0..1}.cbors")
      .filter((s: Sample) => s.key.endsWith("2"))
      .extractKeys("txt").collect()
    assert(sel.length == 1)
  }

  test("round-trip law: arbitrary nested values survive encode∘decode") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // decoded-domain generator: what decode can produce, encode must
    // round-trip (ints as Long, floats as Double, maps as CborMap)
    def valueGen(depth: Int): Gen[Any] =
      if (depth <= 0)
        Gen.oneOf(
          Gen.long,
          Gen.asciiPrintableStr,
          Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
            .map(_.toArray),
          Gen.oneOf(true, false),
          Gen.const(null),
          Gen.double)
      else Gen.oneOf(
        valueGen(0),
        Gen.listOfN(3, valueGen(depth - 1)).map(_.toVector),
        Gen.listOfN(3,
          Gen.zip(Gen.asciiPrintableStr, valueGen(depth - 1)))
          .map(ps => Cbor.CborMap(ps.toVector)))
    def eqv(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
      case (x: Vector[_], y: Vector[_]) =>
        x.length == y.length && x.lazyZip(y).forall(eqv)
      case (Cbor.CborMap(x), Cbor.CborMap(y)) =>
        x.length == y.length && x.lazyZip(y).forall {
          case ((k1, v1), (k2, v2)) => k1 == k2 && eqv(v1, v2)
        }
      case (x: Double, y: Double) => x == y || (x.isNaN && y.isNaN)
      case (x, y) => x == y
    }
    val prop = Prop.forAll(valueGen(3))(v => eqv(Cbor.decode(Cbor.encode(v)), v))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("decoder never crashes on truncated prefixes (corrupt shards)") {
    val full = Cbor.encode(Cbor.CborMap(Vector(
      "__key__" -> "k", "txt" -> "payload text",
      "arr" -> Vector(1L, Vector(2L, 3L), Cbor.CborMap(Vector("x" -> 1L))),
      "bin" -> Array.fill(40)(7.toByte))))
    (0 until full.length).foreach { n =>
      // every prefix either raises EOF/IllegalArgument or decodes a
      // valid (shorter) item — never hangs, never array-overruns
      try { Cbor.decode(full.take(n)); () }
      catch {
        case _: java.io.EOFException | _: IllegalArgumentException => ()
      }
    }
  }

  test("format(cbors) DSv2: schema, counts, url pruning, pruned count") {
    val dir = Files.createTempDirectory("cborsdsv2").toString
    (0 until 3).foreach { shard =>
      val out = new java.io.FileOutputStream(s"$dir/p-$shard.cbors")
      (0 until 4).foreach { i =>
        Cbor.encode(Cbor.CborMap(Vector(
          "__key__" -> f"${shard * 4 + i}%06d",
          "txt" -> s"t $shard/$i")), out)
      }
      out.close()
    }
    val df = spark.read.format("cbors").load(s"$dir/p-{0..2}.cbors")
    assert(df.columns.toSeq == Seq("key", "url", "entries"))
    assert(df.count() == 12)
    assert(df.rdd.getNumPartitions == 3) // one shard = one partition
    // url predicate prunes shards at planning
    val one = spark.read.format("cbors").load(s"$dir/p-{0..2}.cbors")
      .filter(org.apache.spark.sql.functions.col("url")
        .endsWith("p-1.cbors"))
    assert(one.rdd.getNumPartitions == 1)
    assert(one.select("key").collect().map(_.getString(0)).sorted.toSeq ==
      (4 until 8).map(i => f"$i%06d"))
  }

  test("bare (non-map) items and keyless maps get ordinal keys") {
    val dir = Files.createTempDirectory("cbors2").toString
    val out = new java.io.FileOutputStream(s"$dir/x.cbors")
    Cbor.encode("just a string", out)
    Cbor.encode(Cbor.CborMap(Vector("txt" -> "no key")), out)
    out.close()
    val got = CborReader.read(spark, s"$dir/x.cbors")
      .collect().sortBy(_.key)
    assert(got.length == 2)
    assert(got(0).key == "000000000" && got(1).key == "000000001")
    assert(Cbor.decode(got(0).entries("cbor")) == "just a string")
    assert(new String(got(1).entries("txt"), UTF_8) == "no key")
  }
}
