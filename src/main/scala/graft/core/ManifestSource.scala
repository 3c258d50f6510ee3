package graft.core

/** Where a CI run ACQUIRES the production manifest — the acquisition
  * seam of the reference, which resolves its manifest either from a
  * local path handed to the CLI or by fetching the latest successful
  * run's manifest.json from dbt Cloud over HTTP (reference:
  * src/dbt_incremental_ci/core.py:134-165 selects the source;
  * src/dbt_cloud.py:29-172 is the HTTP client). graft keeps the seam
  * but ships only transport-free sources: the warehouse artifact a
  * prod run persisted (the default handoff), a manifest file on any
  * Hadoop-visible path (dbt's `--state` dir / a CI job's downloaded
  * artifact), and an in-memory state for embedded orchestration. An
  * HTTP source slots in as one more implementation when egress
  * exists; CI selection code never knows the difference — that is the
  * point of the trait.
  */
trait ManifestSource {
  /** The production manifest, or None when no prior state exists
    * (first-ever run: everything reads as modified).
    */
  def fetch(): Option[ManifestState]

  /** Human-readable provenance for CLI/report lines. */
  def describe: String
}

object ManifestSource {

  /** The warehouse artifact persisted by the last prod `run` —
    * graft's default handoff (Warehouse.saveArtifact under
    * `<root>/_artifacts/manifest.json`).
    */
  final case class WarehouseArtifact(wh: Warehouse) extends ManifestSource {
    def fetch(): Option[ManifestState] = ManifestState.load(wh)
    def describe: String = s"warehouse artifact ${ManifestState.artifactName}"
  }

  /** A manifest JSON document at an explicit path — local or any
    * Hadoop-visible filesystem (the CLI `--manifest` flag; what a CI
    * job that downloaded prod state out-of-band points at). A missing
    * file is None (no prior state), an unparseable one still fails
    * hard in ManifestState.fromJson — a silently partial manifest
    * would mis-diff every dropped model as "modified".
    */
  final case class FilePath(path: String) extends ManifestSource {
    def fetch(): Option[ManifestState] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try {
          val bytes = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
          Some(ManifestState.fromJson(new String(bytes.toByteArray, "UTF-8")))
        } finally in.close()
      }
    }
    def describe: String = s"manifest file $path"
  }

  /** An already-materialized state — embedded orchestration and tests. */
  final case class Static(state: ManifestState) extends ManifestSource {
    def fetch(): Option[ManifestState] = Some(state)
    def describe: String = "in-memory manifest"
  }
}
