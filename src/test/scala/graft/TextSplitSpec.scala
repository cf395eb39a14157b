package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.TextSplit

/** Goldens + properties for the M1 splitter semantics (reference
  * generate_personalized_commands.sh:322-326: size 200, overlap 20,
  * separator '###', trim). Property inputs are seeded-random so runs are
  * reproducible without a scalatest-scalacheck bridge. */
class TextSplitSpec extends AnyFunSuite with Matchers {

  test("empty and null input produce no chunks") {
    TextSplit.splitText("") shouldBe empty
    TextSplit.splitText(null) shouldBe empty
  }

  test("short text yields a single trimmed chunk") {
    TextSplit.splitText("  hello world  ") shouldBe Seq("hello world")
  }

  test("separator splits and small pieces merge up to chunkSize") {
    // pieces 'alpha' and 'beta' fit in one 200-char chunk joined by a space
    TextSplit.splitText("alpha###beta") shouldBe Seq("alpha beta")
  }

  test("separator pieces that cannot merge stay separate") {
    val a = "a" * 120
    val b = "b" * 120
    TextSplit.splitText(s"$a###$b") shouldBe Seq(a, b)
  }

  test("long unseparated text hard-wraps with the configured overlap") {
    // aperiodic text (position-encoded 4-digit blocks) so substring
    // positions are unambiguous
    val text = (0 until 130).map(i => f"$i%04d").mkString // 520 chars
    val chunks = TextSplit.splitText(text, chunkSize = 200, overlap = 20, sep = "###")
    chunks.foreach(_.length should be <= 200)
    // consecutive chunks share exactly the overlap region
    chunks.sliding(2).foreach {
      case Seq(prev, next) => next.take(20) shouldBe prev.takeRight(20).take(20)
      case _               => ()
    }
    // stride coverage: chunk i starts at i * (size - overlap)
    chunks.zipWithIndex.foreach { case (c, i) =>
      text.indexOf(c.take(30)) shouldBe i * 180
    }
  }

  test("empty separator-delimited sections are dropped") {
    TextSplit.splitText("### one ### ### two ###") shouldBe Seq("one two")
  }

  test("invalid parameters are rejected") {
    an[IllegalArgumentException] should be thrownBy
      TextSplit.splitText("x", chunkSize = 10, overlap = 10)
    an[IllegalArgumentException] should be thrownBy
      TextSplit.splitText("x", chunkSize = 0)
  }

  // --- full 8-arg signature: is_separator_regex / keep_separator /
  // keep_separator_position goldens (one per flag combination) ---

  test("regex separator splits on every pattern match") {
    TextSplit.splitText("one1two22three", sep = "[0-9]+", isRegex = true,
      chunkSize = 5, overlap = 0) shouldBe Seq("one", "two", "three")
    // the same string with isRegex=false finds no literal '[0-9]+'
    TextSplit.splitText("one1two22three", sep = "[0-9]+", isRegex = false,
      chunkSize = 20, overlap = 0) shouldBe Seq("one1two22three")
  }

  test("keep_separator START attaches each separator to the following piece") {
    TextSplit.splitText("a###b###c", sep = "###", keepSeparator = true,
      sepPosition = "START", chunkSize = 4, overlap = 0) shouldBe
      Seq("a", "###b", "###c")
  }

  test("keep_separator END attaches each separator to the preceding piece") {
    TextSplit.splitText("a###b###c", sep = "###", keepSeparator = true,
      sepPosition = "END", chunkSize = 4, overlap = 0) shouldBe
      Seq("a###", "b###", "c")
  }

  test("keep_separator with regex keeps the MATCHED text, not the pattern") {
    TextSplit.splitText("one1two22three", sep = "[0-9]+", isRegex = true,
      keepSeparator = true, sepPosition = "END", chunkSize = 6,
      overlap = 0) shouldBe Seq("one1", "two22", "three")
    TextSplit.splitText("one1two22three", sep = "[0-9]+", isRegex = true,
      keepSeparator = true, sepPosition = "START", chunkSize = 7,
      overlap = 0) shouldBe Seq("one", "1two", "22three")
  }

  test("trim_whitespace=false preserves piece whitespace") {
    TextSplit.splitText(" a ### b ", sep = "###", trimChunks = false,
      chunkSize = 4, overlap = 0) shouldBe Seq(" a ", " b ")
    TextSplit.splitText(" a ### b ", sep = "###", trimChunks = true,
      chunkSize = 4, overlap = 0) shouldBe Seq("a b")
  }

  test("keep_separator pieces reconstruct the original text exactly") {
    // with keep_separator and no trimming, concatenating the separator
    // pass's output must equal the input (no characters lost) for both
    // positions — checked through small chunks that prevent merging
    val t = "aa##bb##cc##dd"
    Seq("START", "END").foreach { pos =>
      val chunks = TextSplit.splitText(t, sep = "##", keepSeparator = true,
        sepPosition = pos, trimChunks = false, chunkSize = 4, overlap = 0)
      chunks.mkString("") shouldBe t
    }
  }

  test("zero-width regex matches do not split (and do not loop)") {
    TextSplit.splitText("abc", sep = "x*", isRegex = true,
      chunkSize = 10, overlap = 0) shouldBe Seq("abc")
  }

  test("invalid keep_separator_position is rejected") {
    an[IllegalArgumentException] should be thrownBy
      TextSplit.splitText("x", sepPosition = "MIDDLE")
  }

  test("property: every chunk is non-empty, trimmed, and within chunkSize") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab #x".toCharArray
    (1 to 200).foreach { _ =>
      val t = Seq.fill(rnd.nextInt(400))(
        if (rnd.nextInt(10) == 0) "###"
        else alphabet(rnd.nextInt(alphabet.length)).toString).mkString
      TextSplit.splitText(t).foreach { c =>
        assert(c.nonEmpty && c == c.trim && c.length <= 200, s"bad chunk for <$t>")
      }
    }
  }

  test("property: separator-free text is fully covered in order") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val t = Seq.fill(1 + rnd.nextInt(300))(('a' + rnd.nextInt(26)).toChar).mkString
      val chunks = TextSplit.splitText(t, chunkSize = 50, overlap = 10)
      // strip the 10-char overlap from every chunk after the first and the
      // concatenation reconstructs the original text
      val rebuilt = chunks.headOption.getOrElse("") +
        chunks.drop(1).map(_.drop(10)).mkString
      rebuilt shouldBe t
    }
  }
}

/** chunkFixedCol (the codegen'd fixed-stride oracle form) against a plain
  * Scala reference. */
class ChunkFixedColSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("fixed-stride chunks match substring arithmetic") {
    import spark.implicits._
    val texts = Seq("", "short", "x" * 199, "y" * 200, "z" * 201, ('a' to 'z').mkString * 30)
    val got = texts.toDF("text")
      .select(TextSplit.chunkFixedCol(col("text"), 200, 180).as("chunks"))
      .as[Seq[String]].collect()
    texts.zip(got).foreach { case (t, chunks) =>
      val starts = 0 until math.max(t.length, 1) by 180
      chunks shouldBe starts.map(s => t.substring(s, math.min(s + 200, t.length)))
    }
  }
}
