package graft

import graft.functions.{MinHashSig, VecDot}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the custom Catalyst expressions, evaluated
  * directly against Literal children — no SparkSession, so hundreds of
  * generated cases run in milliseconds. The reference implementations
  * here are written independently from the expression code (hex-string
  * md5 path, zip/fold) so a shared bug can't hide. */
object ExpressionProperties extends Properties("graft.functions") {

  private val P = 1000000007L
  private val As = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  private val Bs = Seq(1L, 12346L, 24691L, 37036L, 49381L, 61726L, 74071L, 86416L)

  /** Independent spec: md5 → first 15 hex chars → base-16 → mod P. */
  private def refSig(shingles: Seq[String]): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = shingles.map { s =>
      md.reset()
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % P
    }
    As.indices.map { k =>
      if (hs.isEmpty) -1L else hs.map(h => (h * As(k) + Bs(k)) % P).min
    }
  }

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.stringOf(Gen.oneOf("äöüßéç中文日本語한국".toSeq)),
    Gen.const(""))

  property("MinHashSig.eval == independent md5 spec") =
    forAll(Gen.listOf(tokenGen)) { sh =>
      val e = MinHashSig(Literal.create(sh, ArrayType(StringType)), As, Bs, P)
      val got = e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      got == refSig(sh)
    }

  property("MinHashSig: signature values bounded by [0,P) or -1") =
    forAll(Gen.listOf(tokenGen)) { sh =>
      val e = MinHashSig(Literal.create(sh, ArrayType(StringType)), As, Bs, P)
      e.eval(null).asInstanceOf[ArrayData].toLongArray()
        .forall(v => v == -1L || (v >= 0L && v < P))
    }

  property("VecDot.eval == zip/fold over doubles") =
    forAll(Gen.listOf(Gen.chooseNum(-1000f, 1000f))) { xs =>
      val ys = xs.map(x => x * 0.5f + 1f)
      val e = VecDot(
        Literal.create(xs, ArrayType(FloatType)),
        Literal.create(ys, ArrayType(FloatType)))
      val want = xs.zip(ys).foldLeft(0.0) { case (acc, (a, b)) =>
        acc + a.toDouble * b.toDouble
      }
      e.eval(null) == want
    }

  property("VecDot: length mismatch yields NULL") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-10f, 10f))) { xs =>
      val e = VecDot(
        Literal.create(xs, ArrayType(FloatType)),
        Literal.create(xs.tail, ArrayType(FloatType)))
      e.eval(null) == null
    }
}
