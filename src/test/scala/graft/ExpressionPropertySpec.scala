package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.graft.{CharEntropy, WinnowGenerator}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Seeded-random property tests (the repo convention — see
  * CodecPropertySpec) for round 8's per-row expression rewrites, driven
  * at the expression level (`eval` on an InternalRow, no Spark session):
  * each is checked against an independent brute-force reference, so the
  * imperative hot loops (byte histogram, monotonic deque) are exercised
  * far beyond the fixed oracle corpus. */
class ExpressionPropertySpec extends AnyFunSuite with Matchers {

  private val in = BoundReference(0, StringType, nullable = true)
  private def row(s: String) =
    InternalRow(if (s == null) null else UTF8String.fromString(s))

  test("WinnowGenerator matches an O(n·w) window-scan reference on random strings") {
    val rnd = new scala.util.Random(20260813L)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (1 to 300).foreach { _ =>
      val k = 2 + rnd.nextInt(4)
      val w = 2 + rnd.nextInt(4)
      // tiny alphabet → repeated grams → identical hashes exercise the
      // leftmost-position tie-break; lengths straddle the no-window edge
      val p = Array.fill(rnd.nextInt(40))(('a' + rnd.nextInt(3)).toChar).mkString
      val got = WinnowGenerator(in, k, w).eval(row(p)).iterator.toSeq
        .map(r => (r.getInt(0), r.getString(1)))
      val n = p.length - k + 1
      val expected =
        if (n < w) Seq.empty
        else {
          // the relational form's key order and DISTINCT, brute-forced:
          // per-window scan for the min combined key, then distinct —
          // if selections of one key were ever non-contiguous, this
          // would diverge from the generator's consecutive-dedup
          val keys = (0 until n).map(i =>
            md5hex(p.substring(i, i + k)) + ":" + f"${i + 1}%08d")
          (0 to n - w).map(s0 => (s0 until s0 + w).minBy(keys)).distinct
            .map(i => (i + 1, keys(i).substring(0, 32)))
        }
      got shouldBe expected
    }
    // null input emits nothing
    WinnowGenerator(in, 4, 3).eval(row(null)).iterator.toSeq shouldBe Seq.empty
  }

  test("PQ kernels match a scalar reference across random shapes, ties to smaller code") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.graft.{PqEncodeCodes, PqLookupTables}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val vecIn = BoundReference(0, ArrayType(FloatType), nullable = true)
    def vrow(v: Array[Float]) =
      InternalRow(if (v == null) null else new GenericArrayData(v.map(x => x: Any)))
    val rnd = new scala.util.Random(20260815L)
    (1 to 200).foreach { _ =>
      val m = 1 + rnd.nextInt(5)
      val dsub = 1 + rnd.nextInt(4)
      val ksub = 1 + rnd.nextInt(6)
      // small integer-valued floats → frequent EXACT distance ties,
      // exercising the smaller-code tie-break far beyond real data
      def f(): Float = rnd.nextInt(3).toFloat
      val books = Seq.fill(m)(Seq.fill(ksub)(Seq.fill(dsub)(f())))
      val vec = Array.fill(m * dsub)(f())
      // scalar reference: sequential double accumulation, strict-less argmin
      val refLuts = (0 until m).map { j =>
        (0 until ksub).map { c =>
          (0 until dsub).foldLeft(0.0) { (acc, i) =>
            val d = vec(j * dsub + i).toDouble - books(j)(c)(i)
            acc + d * d
          }
        }
      }
      val refCodes = refLuts.map(row => row.indexOf(row.min))
      val gotCodes = PqEncodeCodes(vecIn, books).eval(vrow(vec))
        .asInstanceOf[ArrayData].toIntArray.toSeq
      gotCodes shouldBe refCodes
      val gotLuts = PqLookupTables(vecIn, books).eval(vrow(vec))
        .asInstanceOf[ArrayData]
      (0 until m).foreach { j =>
        gotLuts.getArray(j).toDoubleArray.toSeq shouldBe refLuts(j)
      }
    }
    // NULL and wrong-dimension raise with the operator's name
    val books1 = Seq(Seq(Seq(1f, 2f)))
    val eNull = intercept[IllegalArgumentException] {
      PqEncodeCodes(vecIn, books1, "opX").eval(vrow(null))
    }
    eNull.getMessage should include("opX")
    val eDim = intercept[IllegalArgumentException] {
      PqLookupTables(vecIn, books1, "opY").eval(vrow(Array(1f)))
    }
    eDim.getMessage should include("opY: vector dimension must be 2")
    // a NULL ELEMENT raises too — ArrayData.getFloat on a null slot
    // reads 0.0, the silently-garbage-codes hole the guard closes
    val nullElem = InternalRow(new GenericArrayData(Array[Any](1f, null)))
    val eElem = intercept[IllegalArgumentException] {
      PqEncodeCodes(vecIn, books1, "opZ").eval(nullElem)
    }
    eElem.getMessage should include("opZ: vector must not contain NULL elements")
    val eElem2 = intercept[IllegalArgumentException] {
      PqLookupTables(vecIn, books1, "opW").eval(nullElem)
    }
    eElem2.getMessage should include("opW: vector must not contain NULL elements")
  }


  test("CharEntropy matches a naive histogram reference incl. unicode + case folding") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    (1 to 300).foreach { _ =>
      val s = new String(Array.fill(rnd.nextInt(60)) {
        rnd.nextInt(5) match {
          case 0 => ('A' + rnd.nextInt(26)).toChar       // case folding
          case 1 => ('0' + rnd.nextInt(10)).toChar
          case 2 => Seq(' ', '!', '.', 'é', 'ß', '中', '٣')(rnd.nextInt(7))
          case _ => ('a' + rnd.nextInt(26)).toChar
        }
      })
      val got = CharEntropy(in).eval(row(s))
      // independent reference: Spark's own lower (UTF8String), then a
      // per-char groupBy — no shared counting/entropy code with the impl
      val lowered = UTF8String.fromString(s).toLowerCase.toString
      val counted = lowered.toCharArray.filter(c => alphabet.indexOf(c.toInt) >= 0)
      if (counted.isEmpty) {
        got.asInstanceOf[AnyRef] shouldBe null
      } else {
        val t = counted.length.toDouble
        val e = -counted.groupBy(identity).values
          .map(g => (g.length / t) * math.log(g.length / t)).sum
        got.asInstanceOf[Double] shouldBe (if (e == 0.0) 0.0 else e) +- 1e-9
      }
    }
    CharEntropy(in).eval(row(null)).asInstanceOf[AnyRef] shouldBe null
    // non-ASCII digits ('٣') must NOT count as [0-9]
    CharEntropy(in).eval(row("٣٣٣")).asInstanceOf[AnyRef] shouldBe null
  }

  test("MaxSimDotFloat matches a scalar reference across random shapes and token counts") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.graft.MaxSimDotFloat
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = BoundReference(0, ArrayType(FloatType), nullable = true)
    val b = BoundReference(1, ArrayType(FloatType), nullable = true)
    def r2(x: Array[Float], y: Array[Float]) = InternalRow(
      if (x == null) null else new GenericArrayData(x.map(v => v: Any)),
      if (y == null) null else new GenericArrayData(y.map(v => v: Any)))
    val rnd = new scala.util.Random(20260814L)
    (1 to 200).foreach { _ =>
      val tokens = 1 + rnd.nextInt(6)
      val sub = 1 + rnd.nextInt(5)
      val d = tokens * sub
      val x = Array.fill(d)(rnd.nextFloat() * 2 - 1)
      val y = Array.fill(d)(rnd.nextFloat() * 2 - 1)
      val expected = (0 until tokens).map { t =>
        (0 until tokens).map { j =>
          (0 until sub).foldLeft(0.0)((acc, i) =>
            acc + x(t * sub + i).toDouble * y(j * sub + i).toDouble)
        }.max
      }.sum
      MaxSimDotFloat(a, b, tokens).eval(r2(x, y))
        .asInstanceOf[Double] shouldBe expected
    }
    MaxSimDotFloat(a, b, 4).eval(r2(null, Array(1f, 2f, 3f, 4f)))
      .asInstanceOf[AnyRef] shouldBe null
    // loud failure on misaligned inputs (the SQL caller has no
    // sliceNormalize guard): unequal lengths, or a length that is not
    // a multiple of tokens, must raise — never a silent garbage score
    val mismatch = intercept[IllegalArgumentException] {
      MaxSimDotFloat(a, b, 2).eval(r2(Array(1f, 2f, 3f, 4f), Array(1f, 2f)))
    }
    mismatch.getMessage should include ("multiple of tokens")
    intercept[IllegalArgumentException] {
      MaxSimDotFloat(a, b, 2).eval(r2(Array(1f, 2f, 3f), Array(1f, 2f, 3f)))
    }
  }
}
