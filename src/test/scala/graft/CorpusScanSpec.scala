package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S2/F3-family (SURVEY §2.1/§2.7): recursive directory scan of markup
  * files + regex text extraction (reference preprocess/read_corpus.py:4-30
  * walks a dir tree for *.sgm and strips markup with '>(.*?)<'). */
class CorpusScanSpec extends SparkSpec {

  test("recursive scan + markup strip reproduces the expected text") {
    val root = Files.createTempDirectory("sgm").toString
    Files.createDirectories(Paths.get(s"$root/a/b"))
    Files.writeString(Paths.get(s"$root/a/doc1.sgm"),
      "<DOC><TEXT>hello spark</TEXT><P>nested scan</P></DOC>")
    Files.writeString(Paths.get(s"$root/a/b/doc2.sgm"),
      "<DOC><TEXT>deep file</TEXT></DOC>")
    Files.writeString(Paths.get(s"$root/a/b/skip.txt"), "<X>not sgm</X>")

    val df = spark.read
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.sgm")
      .text(root)
    val texts = df.select(
      array_join(
        filter(regexp_extract_all(col("value"), lit(">([^<]*)<"), lit(1)),
          s => length(s) > 0), " ").as("text"))
      .collect().map(_.getString(0)).toSet
    assert(texts == Set("hello spark nested scan", "deep file"))
  }
}
