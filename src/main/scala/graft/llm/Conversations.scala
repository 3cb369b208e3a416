package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation (SFT / chat) data operators — the post-pretraining half of
  * a training-data pipeline. Pretraining curation treats a document as one
  * string; instruction-tuning data is a SEQUENCE of (role, content) turns
  * with structural invariants (roles alternate, the model's reply comes
  * last, no empty turns) that plain document operators can't check, plus
  * its own dedup granularity (two conversations are duplicates when their
  * full turn sequences match, regardless of ids) and its own render step
  * (a chat template flattens turns back into one trainable string).
  *
  * Input shape: a TURNS frame — one row per turn, keyed by a conversation
  * id and an intra-conversation turn index. This is the scalable
  * representation: turns of one conversation co-locate under the
  * conversation key, every operator below is a keyed window or keyed
  * aggregation on that key (one shuffle, reused across the chained steps
  * by Catalyst since the partitioning is identical), and nothing ever
  * materializes an unbounded array on the driver. A conversation's turns
  * must fit one executor task — the same bound the per-file cal scan
  * documents, and inherent to "render this conversation as one string".
  */
object Conversations {

  /** The ChatML-shaped template, defined ONCE — [[render]]'s concat and
    * [[lossMaskSpans]]'s offset arithmetic both derive from these, so the
    * template cannot drift apart from the spans indexing it.
    */
  val TurnOpen = "<|im_start|>"
  val RoleSep = "\n"
  val TurnClose = "<|im_end|>\n"

  /** Per-conversation structural validation, flat one-row-per-conversation
    * output: (id, n_turns, first_role, alternates, has_empty,
    * ends_with_assistant, valid).
    *
    * The alternation contract is the OpenAI/ShareGPT chat shape: an
    * optional leading `system` turn, then strictly alternating
    * user/assistant starting at user. `valid` additionally requires ≥ 2
    * turns, no empty content, and an assistant turn last (an SFT example
    * with no final assistant reply has no training target).
    */
  /** Function-calling turn validation — the structural gate for tool-use
    * SFT data (the dominant failure modes in collected agent traces:
    * truncated/malformed argument JSON, calls to tools not in the
    * declared set, required arguments absent). `schema` maps each known
    * tool to its REQUIRED argument keys. Per call: `json_ok` (arguments
    * parse as a flat string map — the function-calling wire shape),
    * `known_tool`, `n_missing` (required keys absent; 0 when validation
    * already short-circuited on parse/tool), and the composite `valid`.
    * Pure codegen'd map — `from_json` + a literal when-chain over the
    * (small, broadcast-as-literals) schema; no shuffle, stateless, so
    * the same gate serves batch backfill and the live trace ingest.
    */
  def validateToolCalls(df: DataFrame, idCol: String, toolCol: String,
      argsCol: String, schema: Map[String, Seq[String]]): DataFrame = {
    require(schema.nonEmpty, "need at least one tool in the schema")
    require(schema.values.forall(_.nonEmpty),
      "every tool needs at least one required argument key")
    import org.apache.spark.sql.types.{MapType, StringType}
    val parsed = from_json(col(argsCol), MapType(StringType, StringType))
    val known = col(toolCol).isin(schema.keys.toSeq.sorted: _*)
    val missing = schema.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (t, reqs)) =>
        when(col(toolCol) === t,
          reqs.map(k => when(map_contains_key(parsed, lit(k)), lit(0L))
            .otherwise(lit(1L))).reduce(_ + _))
          .otherwise(acc)
    }
    val jsonOk = parsed.isNotNull
    val nMissing = when(!jsonOk || !known, lit(0L)).otherwise(missing)
    df.select(col(idCol).as("conv_id"), col(toolCol).as("tool"),
      jsonOk.as("json_ok"), known.as("known_tool"),
      nMissing.as("n_missing"),
      (jsonOk && known && nMissing === 0L).as("valid"))
  }

  /** Length-bias audit for preference data — the RLHF pathology check:
    * when "chosen" is systematically longer than "rejected", a reward
    * model trained on the pairs learns length, not quality (the
    * verbosity bias every RLHF data pipeline screens for). ONE
    * aggregation over per-pair token deltas, everything exact integers:
    * pair count, chosen-longer/tie counts, the chosen-longer micro rate
    * and the mean signed token delta in micro units (both via
    * truncate-toward-zero integer division — the semantics Spark DIV
    * and the oracle's `//` share on either sign).
    */
  def lengthBias(pairs: DataFrame, chosenCol: String,
      rejectedCol: String): DataFrame = {
    val d = (TextAnalysis.tokenCount(col(chosenCol)) -
      TextAnalysis.tokenCount(col(rejectedCol))).cast("long")
    pairs.select(d.as("__d"))
      .agg(count(lit(1)).as("n_pairs"),
        // coalesce: sum over ZERO rows is null — the counts are 0 there
        coalesce(sum(when(col("__d") > 0, 1L).otherwise(0L)), lit(0L))
          .as("n_chosen_longer"),
        coalesce(sum(when(col("__d") === 0, 1L).otherwise(0L)), lit(0L))
          .as("n_ties"),
        sum(col("__d")).as("__sum_d"))
      .select(col("n_pairs"), col("n_chosen_longer"), col("n_ties"),
        // zero-guarded (ADVICE r14): an empty pair frame still aggregates
        // to one row (n_pairs = 0, __sum_d = null), and an unguarded DIV 0
        // errors under ANSI — the rates are undefined there, so report null
        when(col("n_pairs") === 0, lit(null).cast("long"))
          .otherwise(expr("(n_chosen_longer * 1000000L) DIV n_pairs"))
          .as("chosen_longer_micro"),
        when(col("n_pairs") === 0, lit(null).cast("long"))
          .otherwise(expr("(__sum_d * 1000000L) DIV n_pairs"))
          .as("mean_delta_micro"))
  }

  def validate(turns: DataFrame, convCol: String, idxCol: String,
               roleCol: String, contentCol: String): DataFrame = {
    // Window over the RENAMED columns: the projection below drops the
    // caller's names, so the window must key on the canonical ones (this
    // was wrong before the query surface exercised it — the window named
    // convCol after the rename and never resolved).
    val w = Window.partitionBy(col("id")).orderBy(col("idx"))
    // Per-turn expected role: position p after the optional system prefix
    // must be user for even p, assistant for odd p. first_value over the
    // conversation-keyed window makes "did this conversation open with
    // system?" available per-turn without a second pass over the data.
    val perTurn = turns.select(
        col(convCol).as("id"), col(idxCol).as("idx"),
        col(roleCol).as("role"), col(contentCol).as("content"))
      .withColumn("first_role", first(col("role")).over(w))
      .withColumn("p",
        row_number().over(w) - when(col("first_role") === "system", 2).otherwise(1))
      .withColumn("role_ok",
        // the system turn itself (p = -1) is ok by definition
        (col("p") === -1) ||
        (col("p") % 2 === 0 && col("role") === "user") ||
        (col("p") % 2 === 1 && col("role") === "assistant"))
    // The window already hash-partitioned by the conversation key, so this
    // aggregation reuses that exchange — one shuffle for the whole check.
    perTurn.groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_turns"),
        min_by(col("role"), col("idx")).as("first_role"),
        min(col("role_ok").cast("int")).cast("boolean").as("alternates"),
        max((length(trim(col("content"))) === 0).cast("int")).cast("boolean")
          .as("has_empty"),
        (max_by(col("role"), col("idx")) === "assistant").as("ends_with_assistant"))
      .withColumn("valid",
        col("alternates") && !col("has_empty") && col("ends_with_assistant") &&
          col("n_turns") >= 2)
  }

  /** Per-conversation size/shape stats: turn count and whitespace-token /
    * char mass split by role — the numbers an SFT packing budget or a
    * turn-length filter keys on. One keyed aggregation.
    */
  def stats(turns: DataFrame, convCol: String, idxCol: String,
            roleCol: String, contentCol: String): DataFrame =
    turns.groupBy(col(convCol).as("id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col(roleCol) === "user",
          TextAnalysis.tokenCount(col(contentCol))).otherwise(0L)).as("user_tokens"),
        sum(when(col(roleCol) === "assistant",
          TextAnalysis.tokenCount(col(contentCol))).otherwise(0L)).as("assistant_tokens"),
        sum(length(col(contentCol)).cast("long")).as("total_chars"))

  /** Content hash of a conversation: sha2-256 over the turn sequence in
    * index order, roles included, with US (0x1f) / RS (0x1e) as field / record
    * separators (characters that cannot appear in normal text, so two
    * different turn sequences cannot collide by concatenation). The
    * conversation-level analog of [[Dedup.exactDedup]]'s document hash.
    */
  def contentHash(turns: DataFrame, convCol: String, idxCol: String,
                  roleCol: String, contentCol: String): DataFrame =
    turns.groupBy(col(convCol).as("id"))
      .agg(array_sort(collect_list(struct(col(idxCol).as("i"),
        concat(col(roleCol), lit("\u001f"), col(contentCol)).as("t")))).as("ts"))
      .select(col("id"),
        sha2(array_join(transform(col("ts"), x => x.getField("t")), "\u001e"), 256)
          .as("conv_hash"))

  /** Exact conversation dedup: (id, conv_hash, n_dups, keep) — `keep` is
    * true for the lowest id of each identical turn sequence. The hash
    * group is a second keyed shuffle, but on a 32-byte key: turn TEXT
    * shuffles once (into [[contentHash]]'s conversation-keyed
    * aggregation), never again.
    */
  def dedupExact(turns: DataFrame, convCol: String, idxCol: String,
                 roleCol: String, contentCol: String): DataFrame = {
    val hashed = contentHash(turns, convCol, idxCol, roleCol, contentCol)
    val w = Window.partitionBy(col("conv_hash"))
    hashed
      .withColumn("n_dups", count(lit(1)).over(w))
      .withColumn("keep", col("id") === min(col("id")).over(w))
  }

  /** Render each conversation through a ChatML-shaped template —
    * `<|im_start|>role\ncontent<|im_end|>\n` per turn, concatenated in
    * index order — and emit the flattened trainable string plus its
    * whitespace-token count (the packing-budget input). One keyed
    * aggregation; the template is applied per-turn BEFORE the reassembly
    * so the concat is a single `array_join`.
    */
  def render(turns: DataFrame, convCol: String, idxCol: String,
             roleCol: String, contentCol: String): DataFrame =
    turns.groupBy(col(convCol).as("id"))
      .agg(array_sort(collect_list(struct(col(idxCol).as("i"),
        concat(lit(TurnOpen), col(roleCol), lit(RoleSep),
          col(contentCol), lit(TurnClose)).as("t")))).as("ts"))
      .select(col("id"),
        array_join(transform(col("ts"), x => x.getField("t")), "").as("rendered"))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("rendered")))

  /** Loss-mask spans for SFT: the character ranges [start_char, end_char)
    * of [[render]]'s output that are TRAINABLE — each assistant turn's
    * content plus its `<|im_end|>\n` terminator (the completion + EOS the
    * loss is computed on); role headers and non-assistant turns are
    * masked. One row per assistant turn, (id, start_char, end_char), so a
    * packer can map char spans to token spans after tokenization.
    *
    * Offsets are UNICODE CODE-POINT indices (what Spark's `length` and
    * DuckDB's `length` both count) — a JVM consumer slicing the rendered
    * string must use code-point-aware offsets (`String.offsetByCodePoints`),
    * not raw UTF-16 `substring`, or astral-plane characters (emoji) shift
    * every later span (ConversationsSpec pins this with a supplementary-
    * character fixture).
    *
    * Offsets are pure arithmetic over per-turn rendered lengths
    * (|TurnOpen| + |role| + |RoleSep| + |content| + |TurnClose| — the
    * shared template constants), summed by ONE conversation-keyed running
    * window: no string is ever re-scanned, and the spans provably index
    * [[render]]'s concatenation because both derive from the same
    * template definition.
    */
  def lossMaskSpans(turns: DataFrame, convCol: String, idxCol: String,
                    roleCol: String, contentCol: String): DataFrame = {
    val turnLen = (lit(TurnOpen.length) + length(col(roleCol)) +
      lit(RoleSep.length) + length(col(contentCol)) +
      lit(TurnClose.length)).cast("long")
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("__len", turnLen)
      .withColumn("__off", coalesce(sum(col("__len")).over(w), lit(0L)))
      .filter(col(roleCol) === "assistant")
      .select(col(convCol).as("id"),
        (col("__off") + lit(TurnOpen.length.toLong) + length(col(roleCol)) +
          lit(RoleSep.length.toLong)).cast("long").as("start_char"),
        (col("__off") + col("__len")).as("end_char"))
  }

  /** Preference-pair (DPO/RLHF) integrity check, one row per pair:
    * (id, chosen_empty, rejected_empty, identical, prompt_dup, keep,
    * valid). `identical` catches the degenerate pair that contributes no
    * preference signal; `prompt_dup`/`keep` dedup pairs that share a
    * prompt (lowest id wins — training on two pairs with the same prompt
    * double-weights it). The prompt group is keyed on the prompt's
    * sha2-256, so prompt text never shuffles.
    */
  def preferenceCheck(pairs: DataFrame, idCol: String, promptCol: String,
                      chosenCol: String, rejectedCol: String): DataFrame = {
    val w = Window.partitionBy(col("prompt_hash"))
    pairs.select(col(idCol).as("id"),
        sha2(col(promptCol), 256).as("prompt_hash"),
        (length(trim(col(chosenCol))) === 0).as("chosen_empty"),
        (length(trim(col(rejectedCol))) === 0).as("rejected_empty"),
        (col(chosenCol) === col(rejectedCol)).as("identical"))
      .withColumn("prompt_dup", count(lit(1)).over(w) > 1)
      .withColumn("keep", col("id") === min(col("id")).over(w))
      .withColumn("valid",
        !col("chosen_empty") && !col("rejected_empty") && !col("identical"))
      .drop("prompt_hash")
  }

  /** Bradley–Terry strength estimation from pairwise preference outcomes
    * (Hunter 2004's MM iteration) — the aggregation step between raw
    * preference pairs and a reward-model prior: which systems/annotator
    * policies actually win, on a common scale.
    *
    *   pᵢ ← Wᵢ / Σ_{j≠i} n_ij / (pᵢ + pⱼ),  normalized to p₀ = 1 each round.
    *
    * Integer micro discipline, so the fixed iteration count replays
    * bit-exactly in SQL: strengths live as integer micros, every division
    * is the round-half-up `(2a + b) / (2b)` integer form, and each
    * denominator TERM rounds to an integer before the per-system sum —
    * aggregation order cannot move anything (magnitudes stay < 2⁶³:
    * games·10¹² with 2× headroom).
    *
    * Scale shape: the win-count aggregation is distributed (one groupBy
    * over the outcome stream); only the K²-bounded count matrix reaches
    * the driver for the iteration loop — K is the SYSTEM universe (models
    * being compared), inherently small, and the loop is O(iters·K²).
    */
  def bradleyTerry(outcomes: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val spark = outcomes.sparkSession
    import spark.implicits._
    val wij = outcomes.groupBy(col(winnerCol).cast("long").as("i"),
        col(loserCol).cast("long").as("j"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val systems = wij.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    require(systems.nonEmpty, "no outcomes")
    val wins = systems.map(i => i -> wij.collect {
      case ((w, _), n) if w == i => n }.sum).toMap
    val games = systems.map(i => i -> systems.map(j =>
      j -> (wij.getOrElse((i, j), 0L) + wij.getOrElse((j, i), 0L))).toMap).toMap
    def rdiv(a: Long, b: Long): Long = (2 * a + b) / (2 * b)
    var p = systems.map(_ -> 1000000L).toMap
    var it = 0
    while (it < iters) {
      val d = systems.map { i =>
        i -> systems.collect { case j if j != i && games(i)(j) > 0 =>
          rdiv(games(i)(j) * 1000000000000L, p(i) + p(j)) }.sum
      }.toMap
      val raw = systems.map { i =>
        require(d(i) > 0, s"system $i has no games")
        i -> rdiv(wins(i) * 1000000000000L, d(i))
      }.toMap
      val base = raw(systems.head)
      require(base > 0, s"anchor system ${systems.head} has zero strength")
      p = systems.map(i => i -> rdiv(raw(i) * 1000000L, base)).toMap
      it += 1
    }
    systems.map(i => (i, wins(i), p(i)))
      .toDF("system", "wins", "strength_micro")
  }

  /** Shared reward-validity gate for the RL-prep operators: a null
    * reward silently wins a min-struct argmax (null sorts first) and
    * Long.MinValue's negation is unrepresentable — both refuse loudly,
    * naming the offending response. One definition so the contract can
    * never diverge between operators.
    */
  // private[graft]: the streaming twin (StreamingRloo) must share this
  // exact gate — a copy would let the batch/stream reward contract diverge.
  private[graft] def validatedReward(rewardMicroCol: String, idCol: String,
      fn: String): Column =
    when(col(rewardMicroCol).isNotNull &&
        col(rewardMicroCol).cast("long") =!= lit(Long.MinValue),
        col(rewardMicroCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"$fn: null or Long.MinValue reward_micro for response id "),
        col(idCol).cast("string"))))

  /** Best-of-N rejection sampling — the RLHF/RAFT selection step: of N
    * sampled responses per prompt, keep the reward-model argmax (and the
    * argmin, because best-vs-worst is how rejection-sampled DPO pairs are
    * minted). ONE min-struct aggregation per prompt — the same shape as
    * source-priority dedup, never a window over the response stream, so
    * map-side partials absorb hot prompts and the output is one row per
    * prompt regardless of N.
    *
    * Ties break toward the smaller response id on BOTH ends (deterministic:
    * (reward, id) is a strict total order when ids are unique). A pair is
    * usable (`pair_valid`) iff the prompt has ≥ 2 responses and the
    * best-worst margin clears `max(minMarginMicro, 1)` — strictly positive,
    * so chosen ≠ rejected by construction and near-tie pairs (reward noise,
    * not preference signal) are screened out, which is the standard
    * rejection-sampling hygiene rule.
    *
    * Every response must be SCORED: a null `reward_micro` fails loudly
    * (ADVICE r15 — `min(struct(...))` does not skip a null-first-field
    * struct, so a null would silently win best_id with a null margin;
    * filter unscored responses upstream if they are expected). Long.
    * MinValue is rejected too: its negation is unrepresentable — ANSI
    * would throw anyway, non-ANSI would wrap it into the WORST slot.
    */
  def bestOfN(responses: DataFrame, promptCol: String, idCol: String,
      rewardMicroCol: String, minMarginMicro: Long = 0L): DataFrame = {
    val r = responses.select(col(promptCol).as("prompt"),
      col(idCol).cast("long").as("id"),
      validatedReward(rewardMicroCol, idCol, "bestOfN").as("reward_micro"))
    r.groupBy(col("prompt"))
      .agg(count(lit(1)).as("n_responses"),
        min(struct((-col("reward_micro")).as("nr"), col("id").as("id")))
          .as("__best"),
        min(struct(col("reward_micro").as("r"), col("id").as("id")))
          .as("__worst"))
      .select(col("prompt"), col("n_responses"),
        col("__best.id").as("best_id"),
        (-col("__best.nr")).as("best_reward_micro"),
        col("__worst.id").as("worst_id"),
        col("__worst.r").as("worst_reward_micro"),
        (-col("__best.nr") - col("__worst.r")).as("margin_micro"))
      .withColumn("pair_valid", col("n_responses") >= 2 &&
        col("margin_micro") >= greatest(lit(minMarginMicro), lit(1L)))
  }

  /** Leave-one-out (RLOO) advantages — the group-relative baseline step
    * of RLOO/GRPO-style RL training prep: each of a prompt's N sampled
    * responses is scored against the mean reward of its N−1 SIBLINGS,
    *
    *   adv_i = r_i − mean(r_j, j≠i) = (N·r_i − Σr) / (N−1),
    *
    * kept EXACT in integer micro units: the numerator is computed in
    * DECIMAL(38,0) (N·r at corpus scale exceeds Long) and the division
    * truncates toward zero identically in Spark and DuckDB — no float
    * mean, so the result is hash-stable and Σ adv over a prompt is
    * within N of zero by construction (truncation residue only). This is
    * the advantage estimate most RL-from-reward pipelines want BEFORE
    * the policy step, and the group mean-center of GRPO without the std
    * division (which would be transcendental; callers normalizing by σ
    * do it policy-side in float).
    *
    * One aggregation per prompt (map-side partials absorb hot prompts,
    * never a window over the response stream) + one shuffle join back on
    * prompt. Null/MinValue rewards refuse loudly like [[bestOfN]].
    * Single-response prompts have NO sibling baseline: `adv_micro` is
    * null and `has_baseline` false — dropping them silently would hide
    * sampler failures.
    */
  def rlooAdvantages(responses: DataFrame, promptCol: String, idCol: String,
      rewardMicroCol: String): DataFrame = {
    // Pinned ONCE: the slim frame is consumed twice (totals aggregation +
    // join back), and without materialization any nondeterministic
    // upstream would give totals over a DIFFERENT row set than the rows
    // joined back — and the caller's reward kernels would run twice.
    val r = responses.select(col(promptCol).as("prompt"),
        col(idCol).cast("long").as("id"),
        validatedReward(rewardMicroCol, idCol, "rlooAdvantages")
          .as("reward_micro"))
      .localCheckpoint()
    val totals = r.groupBy(col("prompt")).agg(
      count(lit(1)).as("n_responses"),
      sum(col("reward_micro")).as("__sum_r"))
    r.join(totals, Seq("prompt"))
      .withColumn("adv_micro",
        when(col("n_responses") >= 2L,
          expr("""(cast(n_responses as decimal(38,0)) * reward_micro
                 - cast(__sum_r as decimal(38,0)))
                 div (n_responses - 1)""").cast("long")))
      .withColumn("has_baseline", col("n_responses") >= 2L)
      .select(col("prompt"), col("id"), col("reward_micro"),
        col("n_responses"), col("adv_micro"), col("has_baseline"))
  }
}
