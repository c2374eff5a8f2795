package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** media_validation.py parity: sniffing, bucket rules, and the five
  * error classes. */
class MediaValidationSpec extends AnyFunSuite {
  import MediaValidation._

  private val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
    0xe0.toByte) ++ Array.fill[Byte](16)(0)
  private val zip = Array[Byte]('P', 'K', 0x03, 0x04) ++
    "rest-of-zip".getBytes("ISO-8859-1")
  private val mp3 = Array[Byte]('I', 'D', '3') ++ Array.fill[Byte](16)(0)
  private val text = "a,b,c\n1,2,3\n".getBytes("UTF-8")

  test("sniffMime magic numbers (ZIP first, like sniff_mime)") {
    assert(sniffMime(jpeg).contains("image/jpeg"))
    assert(sniffMime(zip).contains("application/zip"))
    assert(sniffMime(mp3).contains("audio/mpeg"))
    assert(sniffMime(text).contains("text/plain"))
    assert(sniffMime(Array[Byte](0x01, 0x02, 0x03, 0x00))
      .contains("application/octet-stream"))
  }

  test("validate routes a bare jpeg to the images bucket") {
    assert(validate(jpeg) == (Some("image/jpeg"), Some("images")))
  }

  test("the audio/mpeg3 alias resolves before bucket routing") {
    assert(validateMimeForType(Some("audio/mpeg3"), None) ==
      (Some("audio/mpeg"), Some("sounds")))
  }

  test("explicit bucket constraints: invalid and incompatible raise") {
    intercept[InvalidBucketError] {
      validateMimeForType(Some("image/jpeg"), Some("nope")) }
    intercept[MimeNotAllowedError] {
      validateMimeForType(Some("image/jpeg"), Some("sounds")) }
    // zip has no default bucket: needs an explicit dataset-ish bucket
    intercept[UnknownBucketError] {
      validateMimeForType(Some("application/zip"), None) }
    assert(validateMimeForType(Some("application/zip"), Some("datasets")) ==
      (Some("application/zip"), Some("datasets")))
  }

  test("validate_mime_for_type golden table (test_helpers_media_validation.py:9-30)") {
    def v(m: String, t: String) =
      validateMimeForType(Option(m), Option(t))
    assert(v(null, null) == ((None, None)))
    assert(v(null, "images") == ((None, Some("images"))))
    assert(v("image/jpeg", null) == ((Some("image/jpeg"), Some("images"))))
    assert(v("image/jpeg", "images") == ((Some("image/jpeg"), Some("images"))))
    assert(v("audio/mpeg", null) == ((Some("audio/mpeg"), Some("sounds"))))
    assert(v("audio/mpeg", "sounds") == ((Some("audio/mpeg"), Some("sounds"))))
    assert(v("audio/mpeg3", null) == ((Some("audio/mpeg"), Some("sounds"))))
    assert(v("audio/mpeg3", "sounds") == ((Some("audio/mpeg"), Some("sounds"))))
    assert(v("application/zip", "datasets") ==
      ((Some("application/zip"), Some("datasets"))))
    assert(v("model/mesh", null) == ((Some("model/mesh"), Some("models"))))
    assert(v("model/mesh", "models") == ((Some("model/mesh"), Some("models"))))
    intercept[UnknownBucketError] { v("application/zip", null) }
    intercept[UnknownBucketError] { v("text/plain", null) }
    intercept[InvalidBucketError] { v("application/zip", "foobar") }
    intercept[MimeNotAllowedError] { v("application/zip", "images") }
  }

  test("wrong 'image/jpg' mime is kicked back, not coerced (test:51-62 policy)") {
    intercept[UnknownBucketError] { validate(jpeg, mime = Some("image/jpg")) }
    intercept[MimeNotAllowedError] {
      validate(jpeg, mime = Some("image/jpg"), t = Some("images")) }
  }

  test("content/claim mismatch raises MimeMismatchError") {
    intercept[MimeMismatchError] { validate(zip, mime = Some("image/jpeg")) }
  }

  test("the .stl URL exception forces model/mesh (libmagic can't detect mesh)") {
    assert(validate("solid cube".getBytes, url = Some("http://x/cube.stl")) ==
      (Some("model/mesh"), Some("models")))
  }
}
