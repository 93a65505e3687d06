package pkel.tools

import pkel.text.{BasicNormalizer, PkTokenizer}

/** Ad-hoc driver for the text kernel: `sbt "Test/runMain pkel.tools.KernelDrive <text...>"`.
  * With no args, runs a demo batch. */
object KernelDrive {
  def main(args: Array[String]): Unit = {
    val inputs: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("AUC0-∞", "apparent oral clearance", "The  half-lives   (t1/2β) were long",
        "", "éàζ→ 💊 <b>AUC</b> 1,000 to 2,000", "Cmax/Dose")
    inputs.foreach { s =>
      println(s"input   : '$s'")
      println(s"  norm  : '${BasicNormalizer(s)}'")
      println(s"  tokens: ${PkTokenizer(s).mkString("[", ", ", "]")}")
      println(s"  key   : '${PkTokenizer.blockingKey(s)}'")
    }
    println(s"null-input tokens: ${PkTokenizer(null).mkString("[", ", ", "]")}")
  }
}
