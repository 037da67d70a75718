package graft.pack

/** Conversation construction + image-token scalar functions
  * (SURVEY.md §2.7 F2-F5): the text-shaping layer shared by the pack and
  * tokenize stages. All pure string/array functions.
  */
object Conversations {

  final case class Turn(from: String, value: String)

  // token constants (`tokenize/main.py:20-32`)
  val BosToken = "<s>"
  val EosToken = "</s>"
  val ImageToken = "<image>"
  val KeyframeImageTokens: Seq[String] = Seq("<Iimage>", "<Pimage>")
  val ImPatchToken = "<im_patch>"
  val ImStartToken = "<im_start>"
  val ImEndToken = "<im_end>"
  val PatchesPerImage = 256

  /** `special_token` = `<im_start>` + 256×`<im_patch>` + `<im_end>`. */
  val SpecialToken: String =
    ImStartToken + ImPatchToken * PatchesPerImage + ImEndToken

  /** F2 `add_image_token` (`tokenize/main.py:94-112`): expand the
    * type-specific image placeholder(s) into the 258-token sentinel. */
  def addImageToken(text: String, sampleType: String): String =
    sampleType match {
      case "kf" =>
        KeyframeImageTokens.foldLeft(text)((t, tok) =>
          t.replace(tok, SpecialToken))
      case "un" => text.replace(ImageToken, SpecialToken)
      case "merlin-s" => text
      case other =>
        throw new IllegalArgumentException(s"sample_type $other")
    }

  /** F3 `special_count`: occurrences of the expanded sentinel. */
  def specialCount(s: String): Int = {
    var count = 0
    var idx = s.indexOf(SpecialToken)
    while (idx >= 0) {
      count += 1
      idx = s.indexOf(SpecialToken, idx + SpecialToken.length)
    }
    count
  }

  /** `deafult_conversation` [sic] (`pack/pack.py:28-38`). */
  def defaultConversation(humanValue: String, gptValue: String): Seq[Turn] =
    Seq(Turn("human", humanValue), Turn("gpt", gptValue))

  /** `conversate` (`tokenize/main.py:114-126`). */
  def conversate(prompt: String, text: String, sampleType: String): Seq[Turn] =
    Seq(Turn("human", addImageToken(prompt, sampleType)), Turn("gpt", text))

  /** `conversate_multi` (`tokenize/main.py:128-131`): expand image tokens
    * in human turns only. */
  def conversateMulti(convs: Seq[Turn]): Seq[Turn] =
    convs.map { t =>
      if (t.from == "human") t.copy(value = addImageToken(t.value, "un"))
      else t
    }

  /** `get_question` (`pack/pack.py:40-45`): concat all non-'a' fields. */
  def getQuestion(qa: Seq[(String, String)]): String =
    qa.collect { case (k, v) if k != "a" => v }.mkString

  /** `videochat2_conversation` (`pack/pack.py:47-57`). */
  def videochat2Conversation(
      qaList: Seq[Seq[(String, String)]],
      mediaType: String = "image",
      numSamples: Int = -1): Seq[Turn] = {
    val media =
      if (mediaType == "image") ImageToken else "<video>" * numSamples
    qaList.zipWithIndex.flatMap { case (qa, idx) =>
      val humanValue = getQuestion(qa) + (if (idx == 0) media else "")
      val gptValue = qa.collectFirst { case ("a", v) => v }.getOrElse("")
      defaultConversation(humanValue, gptValue)
    }
  }

  /** merlin-un even/odd role split (P13, `pack/pack.py:118-127`). */
  def merlinUnSplit(convs: Seq[Turn]): (Seq[String], Seq[String]) = {
    val prompts = convs.zipWithIndex.collect {
      case (t, i) if i % 2 == 0 && t.from == "human" => t.value }
    val txts = convs.zipWithIndex.collect {
      case (t, i) if i % 2 != 0 && t.from == "gpt" => t.value }
    (prompts, txts)
  }

  /** F4 `merlin_s_qa_process` (`pack/tools.py:339-378`): split an
    * interleaved `<image>#t#`-annotated transcript into (questions,
    * answers+summary). Questions are `<image>...#timestamp#` runs; the
    * text between them are answers; the final answer splits on
    * "Summary:". */
  def merlinSQaProcess(input: String): (Seq[String], Seq[String]) = {
    val imagePat = "<image>(?:#)*".r
    val timePat = "#\\d+(?:\\.\\d+)?(?:-\\d+\\.\\d+)?#".r
    val timeSteps = timePat.findAllIn(input).toSeq
    val matches = imagePat.findAllIn(input).toSeq

    // re-locate matches sequentially (mirrors the find/last_image_index loop)
    val located = {
      var last = 0
      matches.map { m =>
        val start = input.indexOf(m, last)
        val end = start + m.length
        last = end
        input.substring(start, end)
      }
    }
    // merge runs: a match not ending in '#' glues onto the next one
    val resList = Seq.newBuilder[String]
    var carry = ""
    located.foreach { m =>
      val glued = carry + m
      if (glued.endsWith("#")) { resList += glued; carry = "" }
      else carry = glued
    }
    val questions0 = resList.result().zip(timeSteps).map {
      case (tok, ts) => tok.dropRight(1) + ts
    }
    val answers0 = questions0
      .foldLeft(Seq(input)) { (parts, q) =>
        parts.init ++ parts.last.split(java.util.regex.Pattern.quote(q), -1)
          .toSeq
      }.drop(1)
    val questions = questions0 :+ "Summary this video."
    // a record with no <image> runs yields no answers — fail with the
    // offending value instead of a bare NoSuchElementException killing
    // the pack task anonymously
    require(answers0.nonEmpty,
      s"merlin-s value has no <image>#ts# runs: '${input.take(80)}'")
    val Array(lastAnswer, summary) =
      answers0.last.split("Summary:", 2) match {
        case a if a.length == 2 => a
        case _ => throw new IllegalArgumentException("no Summary: section")
      }
    val answers = answers0.init :+ lastAnswer :+ summary
    (questions, answers)
  }

  /** Caption blacklist (P12, `pack/pack.py:19-22`) — declared in the
    * reference but dead; kept as an optional cleaning predicate. */
  val BlackWords: Seq[String] = Seq(
    "image unavailable", ".com", ".jpg", ".pdf", ".jpeg", "png", "tiff", "svg")

  def passesBlacklist(caption: String): Boolean = {
    val low = caption.toLowerCase(java.util.Locale.ROOT)
    !BlackWords.exists(low.contains)
  }
}
