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

  /** The mainnet miner-fee contract tree. The reference derives it at
    * runtime from ergo-wallet (`ErgoScriptPredef.feeProposition`,
    * Const.scala:86); the engine pins the resulting wire bytes, as observed
    * in mainnet fee outputs, so fee attribution (P3/A2) works on real
    * blocks without the wallet dependency.
    */
  val MainnetFeeTree: String =
    "1005040004000e36100204a00b08cd0279be667ef9dcbbac55a06295ce870b0702" +
      "9bfcdb2dce28d959f2815b16f81798ea02d192a39a8cc7a701730073011001020402" +
      "d19683030193a38cc7b2a57300000193c2b2a57301007473027303830108cdeeac93b1a57304"

  /** Mainnet protocol contract trees (public chain constants — reference
    * Const.scala:30-78 Protocol.{Emission,Foundation,NoPremine}): the
    * P14 blacklist fed to [[BlockDerivation.derive]] so protocol boxes
    * (the ~9.3·10^16-nanoERG re-emitted emission box above all) never
    * enter the user-coin economics sums.
    */
  val MainnetEmissionTree: String =
    "101004020e36100204a00b08cd0279be667ef9dcbbac55a06295ce870b07029bfc" +
      "db2dce28d959f2815b16f81798ea02d192a39a8cc7a7017300730110010204020404" +
      "040004c0fd4f05808c82f5f6030580b8c9e5ae040580f882ad16040204c0944004c0" +
      "f407040004000580f882ad16d19683030191a38cc7a7019683020193c2b2a5730000" +
      "7473017302830108cdeeac93a38cc7b2a573030001978302019683040193b1a57304" +
      "93c2a7c2b2a573050093958fa3730673079973089c73097e9a730a9d99a3730b730c" +
      "0599c1a7c1b2a5730d00938cc7b2a5730e0001a390c1a7730f"
  val MainnetFoundationTree: String =
    "100e040004c094400580809cde91e7b0010580acc7f03704be94400480894805808" +
      "0c7b7e4992c0580b4c4c32104fe884804c0fd4f0580bcc1960b04befd4f05000400" +
      "ea03d192c1b2a5730000958fa373019a73029c73037e997304a305958fa373059a7" +
      "3069c73077e997308a305958fa373099c730a7e99730ba305730cd193c2a7c2b2a5" +
      "730d00d5040800"
  val MainnetNoPremineTree: String = "10010100d17300"
  val MainnetProtocolTrees: Seq[String] =
    Seq(MainnetEmissionTree, MainnetFoundationTree, MainnetNoPremineTree)

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
