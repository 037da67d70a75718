package graft.pipeline

import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.pack.Loaders

/** S15 loader normalizers over synthesized metadata fixtures
  * (FIXTURES.md A4): every format lands on (video_path, value). */
class LoadersSpec extends SparkSpec {

  private def write(name: String, content: String): String = {
    val d = Files.createTempDirectory("loaders")
    val f = d.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("webvid-style index-keyed caption maps") {
    val p = write("webvid.json",
      """{"image": {"0": "v0.mp4", "1": "v1.mp4"},
        | "value": {"0": "cap zero", "1": "cap one"}}""".stripMargin)
    val df = Loaders.loadCaptionMap(spark, p, prefix = "s3a://bucket/")
      .orderBy("video_path").collect()
    assert(df.length == 2)
    assert(df.head.getString(0) == "s3a://bucket/v0.mp4")
    assert(df.head.getString(1) == "cap zero")
  }

  test("ego4d/hd3m-style caption arrays (video_path or video column)") {
    val p = write("ego4d.json",
      """[{"video_path": "a.mp4", "caption": "ca"},
        | {"video_path": "b.mp4", "caption": "cb"}]""".stripMargin)
    val df = Loaders.loadCaptionArray(spark, p).orderBy("video_path").collect()
    assert(df.map(_.getString(0)).toSeq == Seq("a.mp4", "b.mp4"))
    val p2 = write("hd3m.json",
      """[{"video": "c.mp4", "caption": "cc"}]""")
    assert(Loaders.loadCaptionArray(spark, p2).collect()
      .head.getString(0) == "c.mp4")
  }

  test("internvid-style jsonl") {
    val p = write("internvid.jsonl",
      """{"YoutubeID": "yt1", "Start_timestamp": "0:01", "End_timestamp": "0:09", "Caption": "x"}
        |{"YoutubeID": "yt2", "Start_timestamp": "0:02", "End_timestamp": "0:08", "Caption": "y"}""".stripMargin)
    val df = Loaders.loadJsonl(spark, p, prefix = "/vids/")
      .orderBy("video_path").collect()
    // clip path = {id}_{start}_{end}.mp4 (dataset_loader.py:158):
    // captions are per-clip; id-only paths would merge a video's clips
    assert(df.map(_.getString(0)).toSeq ==
      Seq("/vids/yt1_0:01_0:09.mp4", "/vids/yt2_0:02_0:08.mp4"))
  }

  test("how2link-style nested clips explode") {
    val p = write("how2link.json",
      """[{"clips": [{"clip_path": "c1.mp4", "caption": "k1"},
        |            {"clip_path": "c2.mp4", "caption": "k2"}]},
        | {"clips": [{"clip_path": "c3.mp4", "caption": "k3"}]}]""".stripMargin)
    val df = Loaders.loadClips(spark, p).orderBy("video_path").collect()
    assert(df.length == 3)
    assert(df.map(_.getString(1)).toSeq == Seq("k1", "k2", "k3"))
  }

  test("sft/llava-style conversations carried as JSON") {
    val p = write("sft.json",
      """[{"image": "i.jpg",
        |  "conversations": [{"from": "human", "value": "q"},
        |                    {"from": "gpt", "value": "a"}]}]""".stripMargin)
    val r = Loaders.loadConversations(spark, p).collect().head
    assert(r.getString(0) == "i.jpg")
    assert(r.getString(1).contains("\"from\":\"human\""))
  }

  test("videochat2: {images, conversations} records for merlin-un") {
    val p = write("vc2.json",
      """[{"images": ["a.jpg", "b.jpg"],
        |  "conversations": [{"from": "human", "value": "q"},
        |                    {"from": "gpt", "value": "a"}]}]""".stripMargin)
    val r = Loaders.loadVideochat2(spark, p, prefix = "img/").collect().head
    assert(r.getAs[String]("video_path") == "img/a.jpg")
    assert(r.getAs[scala.collection.Seq[String]]("media_paths").toSeq ==
      Seq("img/a.jpg", "img/b.jpg"))
    assert(r.getAs[String]("value").contains("\"from\":\"human\""))
  }

  test("sft fallback: {video, QA} records carry the QA list as JSON") {
    val p = write("videosft.json",
      """[{"video": "v.mp4", "QA": [{"q": "what", "a": "that"}]}]""")
    val r = Loaders.loadSft(spark, p, prefix = "clips/").collect().head
    assert(r.getAs[String]("video_path") == "clips/v.mp4")
    assert(r.getAs[String]("value").contains("\"q\":\"what\""))
  }

  test("merlin-s interleave records (image_info dicts + text_list)") {
    val p = write("merlin.jsonl",
      """{"image_info": [{"image_name": "data//a.jpg"}, {"image_name": "Black background: 4, 3"}], "text_list": "<image>#3# ans Summary: s"}
        |{"image_info": [{"image_name": "b.jpg"}], "text_list": "<image>#7# two Summary: t"}""".stripMargin)
    val df = Loaders.loadMerlin(spark, p).orderBy("video_path").collect()
    assert(df.length == 2)
    val r = df.find(_.getAs[String]("video_path") == "data//a.jpg").get
    assert(r.getAs[scala.collection.Seq[String]]("media_paths").toSeq ==
      Seq("data//a.jpg", "Black background: 4, 3"))
    assert(r.getAs[String]("value").contains("Summary:"))
  }

  test("unicontrol-style source/control/prompt") {
    val p = write("uni.jsonl",
      """{"source": "s.jpg", "control_canny": "c.jpg", "prompt": "make it"}""")
    val r = Loaders.loadUnicontrol(spark, p, "src/", "tgt/").collect().head
    assert(r.getAs[String]("video_path") == "src/s.jpg")
    assert(r.getAs[String]("target_path") == "tgt/c.jpg")
    assert(r.getAs[String]("value") == "make it")
  }
}
