package graft.providers

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The Azure providers themselves need credentials + egress, but their
  * response parsing is pure — tested offline so the remote path isn't
  * dead weight. Payload shapes follow the public Azure OpenAI REST
  * responses. */
class HttpParseSpec extends AnyFunSuite with Matchers {

  test("parseEmbeddings extracts every embedding array in order") {
    val payload =
      """{"object":"list","data":[
        |{"object":"embedding","index":0,"embedding":[0.1, -0.25, 3.0]},
        |{"object":"embedding","index":1,"embedding":[1.5, 2.5, -0.5]}],
        |"model":"text-embedding-ada-002"}""".stripMargin
    val got = Http.parseEmbeddings(payload, 2)
    got.map(_.toSeq) shouldBe Seq(Seq(0.1f, -0.25f, 3.0f), Seq(1.5f, 2.5f, -0.5f))
  }

  test("parseEmbeddings rejects a short response instead of misaligning rows") {
    val payload = """{"data":[{"embedding":[0.5]}]}"""
    an[IllegalArgumentException] should be thrownBy Http.parseEmbeddings(payload, 2)
  }

  test("parseChatContent unescapes the first message content") {
    val payload =
      """{"choices":[{"index":0,"message":{"role":"assistant",
        |"content":"line one\nline \"two\"\ttabbed é"}}]}""".stripMargin
    Http.parseChatContent(payload) shouldBe "line one\nline \"two\"\ttabbed é"
  }

  test("parseChatContent falls back to the raw body when no content field") {
    Http.parseChatContent("""{"error": "rate limited"}""") shouldBe
      """{"error": "rate limited"}"""
  }
}
