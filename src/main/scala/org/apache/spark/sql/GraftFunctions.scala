package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AudioMeta, CosineSim, ImageMeta, JaroWinklerSim, MinhashBands, ShingleHashes, VideoMeta, WinnowFps}

/** Registers graft's native Catalyst expressions into a session's
  * function registry so they are usable inside SQL fragments and
  * higher-order-function lambdas (where the Column API can't reach).
  *
  * Lives in the org.apache.spark.sql package purely to cross the
  * `private[sql] sessionState` boundary — the sanctioned alternative
  * (SparkSessionExtensions) only covers sessions WE build, while this
  * also lets query builders self-register on sessions created by the
  * test driver or a spark-shell. Registration is idempotent.
  */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (children => CosineSim(children(0), children(1))),
    "graft_shingle_hashes" -> (children => ShingleHashes(children(0))),
    "graft_minhash_bands" -> (children => MinhashBands(children(0))),
    "graft_winnow_fps" -> (children => WinnowFps(children(0))),
    "graft_image_meta" -> (children => ImageMeta(children(0))),
    "graft_audio_meta" -> (children => AudioMeta(children(0))),
    "graft_video_meta" -> (children => VideoMeta(children(0))),
    "graft_jaro_winkler" -> (children => JaroWinklerSim(children(0), children(1))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(
          id,
          new ExpressionInfo(classOf[CosineSim].getCanonicalName, name),
          builder)
      }
    }
  }

  /** Same registrations through the public SparkSessionExtensions API
    * (used by graft.GraftExtensions for config-injected deployments). */
  def injectInto(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSim].getCanonicalName, name),
        builder))
    }
}
