package graft.chain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Protocol constants and the emission/reward schedule (SURVEY.md §2 P4),
  * after `Const.scala:102-113` and `RewardCalculator.scala:38-58` in the
  * reference (public Ergo consensus parameters).
  *
  * The schedule is implemented twice on purpose: [[emissionAt]] /
  * [[issuedCoinsAt]] are closed-form *column expressions* (pure arithmetic →
  * whole-stage codegen, no UDF) used by the derivation pipeline, and the
  * `*Scala` mirrors are the straightforward iterative definitions used by
  * tests to cross-check the closed forms.
  */
object ChainConst {

  val CoinsInOneErgo: Long = 1000000000L
  val FixedRatePeriod: Long = 525600L
  val EpochLength: Long = 64800L
  val FixedRate: Long = 75L * CoinsInOneErgo
  val OneEpochReduction: Long = 3L * CoinsInOneErgo
  val TeamTreasuryThreshold: Long = 67500000000L
  val Eip27UpperPoint: Long = 15L * CoinsInOneErgo
  val Eip27DefaultReEmission: Long = 12L * CoinsInOneErgo
  val Eip27LowerPoint: Long = 3L * CoinsInOneErgo
  val Eip27ResidualEmission: Long = 3L * CoinsInOneErgo
  val Eip27ActivationHeight: Long = 777217L

  /** Stats epoch for roll-up reporting (reference readme epochs). */
  val StatsEpochLength: Int = 1024

  /** Height-bucket size shared by the warehouse partitioning (ChainIngest)
    * and the derivation's two-phase prefix sums (application.conf compaction
    * cadence in the reference). ~1M mainnet blocks → ~100 buckets.
    */
  val HeightBucketSize: Int = 10000

  /** Dust threshold for graph edges (TxGraphWriter.scala:44,59). */
  val DustThreshold: Long = CoinsInOneErgo

  // number of reducing epochs until emission hits zero: 75/3 = 25 → epochs
  // 1..24 are positive, epoch 25 is the first zero-rate epoch.
  private val PositiveEpochs: Long = FixedRate / OneEpochReduction - 1

  /** Per-block emission at `height` (column form). */
  def emissionAt(height: Column): Column = {
    val epoch = lit(1L) + floor((height - FixedRatePeriod) / EpochLength).cast("long")
    when(height < FixedRatePeriod, FixedRate)
      .otherwise(greatest(lit(FixedRate) - lit(OneEpochReduction) * epoch, lit(0L)))
  }

  def emissionAtScala(h: Long): Long =
    if (h < FixedRatePeriod) FixedRate
    else math.max(FixedRate - OneEpochReduction * (1 + (h - FixedRatePeriod) / EpochLength), 0L)

  /** Total coins issued after `height` (column form, closed-form sum of the
    * epoch arithmetic series).
    */
  def issuedCoinsAt(height: Column): Column = {
    val m = floor((height - FixedRatePeriod) / EpochLength).cast("long") // completed epochs
    val mPos = least(m, lit(PositiveEpochs))
    // mPos*(mPos+1)/2 is exact (mPos ≤ 24); keep the division integral so the
    // whole expression stays LongType.
    val triangular = (mPos * (mPos + 1) / 2).cast("long")
    val fullEpochsIssued =
      (mPos * FixedRate - lit(OneEpochReduction) * triangular) * EpochLength
    val inEpoch = (height - FixedRatePeriod) % EpochLength + 1
    val rateNow = greatest(lit(FixedRate) - lit(OneEpochReduction) * (m + 1), lit(0L))
    when(height < FixedRatePeriod, lit(FixedRate) * height)
      .otherwise(lit(FixedRate * (FixedRatePeriod - 1)) + fullEpochsIssued + inEpoch * rateNow)
  }

  def issuedCoinsAtScala(h: Long): Long =
    if (h < FixedRatePeriod) FixedRate * h
    else {
      val completed = (h - FixedRatePeriod) / EpochLength
      val full = (1L to completed).map(e => math.max(FixedRate - OneEpochReduction * e, 0L) * EpochLength).sum
      val inEpoch = (h - FixedRatePeriod) % EpochLength + 1
      FixedRate * (FixedRatePeriod - 1) + full + inEpoch * math.max(FixedRate - OneEpochReduction * (completed + 1), 0L)
    }

  /** Miner reward at `height` with the EIP-27 piecewise adjustment
    * (RewardCalculator.scala:38-58).
    */
  def minerRewardAt(height: Column): Column = {
    val reward = least(lit(TeamTreasuryThreshold), emissionAt(height))
    val eip27 = when(reward >= Eip27UpperPoint, reward - Eip27DefaultReEmission)
      .when(reward > Eip27LowerPoint, Eip27ResidualEmission)
      .otherwise(reward)
    when(height >= Eip27ActivationHeight, eip27).otherwise(reward)
  }

  def minerRewardAtScala(h: Long): Long = {
    val reward = math.min(TeamTreasuryThreshold, emissionAtScala(h))
    if (h >= Eip27ActivationHeight) {
      if (reward >= Eip27UpperPoint) reward - Eip27DefaultReEmission
      else if (reward > Eip27LowerPoint) Eip27ResidualEmission
      else reward
    } else reward
  }
}
