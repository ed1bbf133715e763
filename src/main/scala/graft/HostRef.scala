package graft

/** The host-drift reference point for `host_index` (Bench): the
  * steady-state mainnet-replay rate of the committed quiet-box baseline
  * artifact named in [[Artifact]]. ONE named constant, asserted equal to
  * the artifact's `mainnet_blocks_per_s` by HostRefSpec — refreshing the
  * baseline pair without updating this constant fails the build instead
  * of silently re-basing every subsequent round's host index (r13
  * ADVICE).
  */
object HostRef {
  /** Committed bench artifact the rate is pinned to (repo root). */
  val Artifact = "BENCH_sf1_r12c.json"
  val Rate = 6073.304376039792
}
