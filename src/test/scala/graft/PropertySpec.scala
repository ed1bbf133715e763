package graft

import graft.chain.{ChainConst, RegisterParser}
import graft.functions.{CryptoFunctions, TokenCountExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the pure scalar layer (SURVEY.md §5 — the
  * reference has no property tests; these harden the codecs the pipeline
  * depends on). Uses scalacheck Gens sampled from a fixed seed (the
  * scalatest-scalacheck bridge isn't in the offline artifact cache).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    Iterator.from(0)
      .map(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(a) => a }
      .take(n).toSeq

  private val byteArrays: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  test("base58 round-trips arbitrary byte arrays, preserving leading zeros") {
    samples(Gen.zip(Gen.choose(0, 8), byteArrays)).foreach { case (zeros, tail) =>
      val bytes = Array.fill[Byte](zeros)(0) ++ tail
      val enc = CryptoFunctions.base58Encode(bytes)
      assert(CryptoFunctions.base58Decode(enc).exists(_.sameElements(bytes)),
        s"round-trip failed for ${bytes.toSeq.take(12)}…")
    }
  }

  test("sigma int/long register encodings round-trip") {
    samples(Gen.choose(Int.MinValue, Int.MaxValue)).foreach { n =>
      assert(RegisterParser.parse(RegisterParser.encodeInt(n)) ==
        RegisterParser.ParsedRegister("SInt", n.toString))
    }
    samples(Gen.choose(Long.MinValue, Long.MaxValue)).foreach { n =>
      assert(RegisterParser.parse(RegisterParser.encodeLong(n)) ==
        RegisterParser.ParsedRegister("SLong", n.toString))
    }
    samples(Gen.asciiPrintableStr).foreach { s =>
      val r = RegisterParser.renderUtf8(RegisterParser.encodeUtf8(s))
      if (s.nonEmpty && s.count(Character.isISOControl) * 10 <= s.length)
        assert(r.contains(s))
    }
  }

  test("token_count equals the split definition on arbitrary ascii text") {
    val texty = Gen.listOf(Gen.frequency(
      5 -> Gen.asciiPrintableChar, 2 -> Gen.oneOf(' ', '\t', '\n', '\r')))
    samples(texty, 500).foreach { chars =>
      val s = chars.mkString
      val viaSplit = s.trim.split("\\s+").count(_.nonEmpty)
      assert(TokenCountExpression.countTokens(UTF8String.fromString(s)) == viaSplit,
        s"mismatch on '${s.take(50).replace("\n", "\\n")}'")
    }
  }

  test("word_shingles kernel equals the sliding-window definition") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val gen = Gen.zip(Gen.listOf(word), Gen.choose(1, 6))
    samples(gen, 500).foreach { case (tokens, k) =>
      val expected =
        if (tokens.length < k) Seq.empty
        else tokens.sliding(k).map(_.mkString(" ")).toSeq.distinct
      val arr = new GenericArrayData(
        tokens.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.WordShinglesExpression.shingles(arr, k)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotSeq == expected, s"mismatch for tokens=$tokens k=$k")
    }
  }

  test("emission invariants: nonincreasing per-block, nondecreasing cumulative") {
    samples(Gen.zip(Gen.choose(1L, 3000000L), Gen.choose(1L, 3000000L))).foreach {
      case (a, b) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        assert(ChainConst.emissionAtScala(lo) >= ChainConst.emissionAtScala(hi))
        assert(ChainConst.issuedCoinsAtScala(lo) <= ChainConst.issuedCoinsAtScala(hi))
        assert(ChainConst.minerRewardAtScala(a) <= ChainConst.emissionAtScala(a))
    }
  }

  test("blake2b256 is length-stable and collision-free on distinct inputs") {
    val strs = samples(Gen.asciiStr)
    strs.foreach(s => assert(CryptoFunctions.blake2b256(s.getBytes).length == 32))
    val hashes = strs.distinct.map(s => CryptoFunctions.blake2b256(s.getBytes).toSeq)
    assert(hashes.distinct.size == strs.distinct.size, "collision among samples")
  }
}
