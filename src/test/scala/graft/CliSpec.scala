package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The REPL dispatch surface (yark.py analogue): token resolution, help,
  * error shapes, and the three archive flows end to end via dispatch. */
class CliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("unknown command/method errors mirror the reference's shape") {
    assert(Cli.dispatch(spark, "frobnicate x").isLeft)
    assert(Cli.dispatch(spark, "archive nonsense").isLeft)
    assert(Cli.dispatch(spark, "").isLeft)
    assert(Cli.dispatch(spark, "help").toOption.get.contains("archive video"))
  }

  test("archive history via dispatch writes deduped parquet") {
    val json = Files.createTempFile("hist", ".json")
    Files.writeString(json,
      """[{"titleUrl":"https://www.youtube.com/watch?v=dQw4w9WgXcQ",
        |  "time":"2024-01-01T10:00:00Z"},
        | {"titleUrl":"https://www.youtube.com/watch?v=dQw4w9WgXcQ",
        |  "time":"2024-01-01T10:00:00Z"},
        | {"time":"2024-01-01T11:00:00Z"}]""".stripMargin)
    val out = Files.createTempDirectory("cli_out").toString
    val r = Cli.dispatch(spark, s"archive history $json $out")
    assert(r === Right(s"archived 1 events (1 unavailable) to $out"))
    assert(spark.read.parquet(s"$out/history").count() === 1)
  }

  test("archive playlist via dispatch preserves order") {
    // tokenizer splits on whitespace like the reference's input().split(),
    // so the dispatch path must be space-free (stem-with-spaces semantics
    // is covered in PipelineSpec)
    val csv = Files.createTempFile("MyMix_videos", ".csv")
    Files.writeString(csv,
      "Video ID,Time Created\naaaaaaaaaaa,2024-01-01T09:00:00Z\n")
    val out = Files.createTempDirectory("cli_out2").toString
    val r = Cli.dispatch(spark, s"archive playlist $csv $out")
    assert(r.isRight, r)
    assert(spark.read.parquet(s"$out/playlist_videos").count() === 1)
  }

  test("config gate via dispatch controls the comments stage (§2.10)") {
    val jsonl = Files.createTempFile("info", ".jsonl")
    Files.writeString(jsonl,
      """{"id":"vid00000001","fulltitle":"T","channel_id":"ch1","uploader_id":"u1","comments":[{"id":"c1","author_id":"u2","author":"A","text":"t","like_count":0,"is_favorited":false,"author_is_uploader":false,"parent":"root","timestamp":1700000000}]}""")
    val out = Files.createTempDirectory("cli_out3").toString
    assert(Cli.dispatch(spark, "config set comments false") ===
      Right("comments = false"))
    try {
      assert(Cli.dispatch(spark, s"archive video $jsonl $out").isRight)
      assert(!Files.exists(java.nio.file.Paths.get(s"$out/comments")))
      assert(spark.read.parquet(s"$out/videos").count() === 1)
    } finally spark.conf.unset("spark.graft.comments")
    assert(Cli.dispatch(spark, "config get comments") === Right("true"))
  }
}
