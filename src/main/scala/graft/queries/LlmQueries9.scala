package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.llm.Ulm

/** Round-15 LLM-pipeline gates: the unigram-LM (SentencePiece-family)
  * tokenizer — training and Viterbi segmentation — next to the BPE
  * family in [[LlmQueries6]]. Oracles are generated from the SAME
  * constants (vocab size, piece/word caps, EM rounds, cost scale) by
  * [[Ulm.trainSqlDuck]]/[[Ulm.segmentSqlDuck]], with the EM rounds and
  * DP positions unrolled as CTEs — the [[graft.llm.Bpe]] round-chain
  * discipline.
  */
object LlmQueries9 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ulm_train" -> ((s, dir) =>
      Ulm.train(Tables.documents(s, dir), "text")),

    "ulm_segment" -> ((s, dir) =>
      Ulm.segment(Tables.documents(s, dir), "text"))
  )

  val oracleSql: Map[String, String] = Map(
    "ulm_train" -> Ulm.trainSqlDuck("documents", "text"),
    "ulm_segment" -> Ulm.segmentSqlDuck("documents", "text")
  )
}
