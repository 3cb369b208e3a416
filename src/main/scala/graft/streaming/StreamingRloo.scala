package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.llm.Conversations.rlooAdvantages]] — the
  * leave-one-out advantage step as responses ARRIVE from the samplers
  * rather than after a batch dump.
  *
  * The batch form is an aggregation + join-back on prompt, which streaming
  * complete mode cannot express (a streaming aggregate can't re-join its
  * own input). The streaming shape instead carries each prompt's response
  * set THROUGH the aggregation — `collect_list(struct(id, reward))`
  * alongside the same count/sum — and explodes it back out, so every
  * output row is computed from exactly the same (N, Σr, r_i) triple as the
  * batch operator: adv = (N·r_i − Σr) div (N−1) in DECIMAL(38,0), same
  * truncation, null + `has_baseline=false` for single-response prompts.
  *
  * State per prompt is its response list — bounded by the sampler's
  * fan-out (N is tens, a design constant), never by stream length, so
  * complete-mode state is O(prompts · N): the same bound the batch
  * operator's shuffle carries. Chunking invariance (arrival micro-batch
  * boundaries never change any advantage) is certified by
  * `tools/StreamInvariance` family `rloo` against the batch operator.
  *
  * Rewards are validated the same way as batch ([[graft.llm.Conversations]]
  * `validatedReward`): null / Long.MinValue refuse loudly.
  */
object StreamingRloo {

  def advantages(stream: DataFrame, promptCol: String = "prompt",
      idCol: String = "id", rewardMicroCol: String = "reward_micro"): DataFrame = {
    // The batch operator's gate, shared (not copied): the reward contract
    // cannot diverge between the batch and streaming forms.
    val validated = graft.llm.Conversations.validatedReward(
      rewardMicroCol, idCol, "StreamingRloo.advantages")
    stream
      .select(col(promptCol).as("prompt"), col(idCol).cast("long").as("id"),
        validated.as("reward_micro"))
      .groupBy(col("prompt"))
      .agg(count(lit(1)).as("n_responses"),
        sum(col("reward_micro")).as("__sum_r"),
        collect_list(struct(col("id"), col("reward_micro"))).as("__rs"))
      .select(col("prompt"), col("n_responses"), col("__sum_r"),
        explode(col("__rs")).as("__r"))
      .select(col("prompt"), col("__r.id").as("id"),
        col("__r.reward_micro").as("reward_micro"), col("n_responses"),
        col("__sum_r"))
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
