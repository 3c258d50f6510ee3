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

  /** The dbt-Cloud-shaped HTTP source (reference:
    * src/dbt_cloud.py:29-172, wired via core.py:134-165): list the
    * job's recent runs newest-finished-first, take the first
    * SUCCESSFUL one (status 10), then fetch that run's
    * `manifest.json` artifact — or skip the listing when an explicit
    * `runId` is given, exactly the reference's override. Token auth
    * header on every request; any non-2xx fails hard
    * (raise_for_status — a partial or unauthorized fetch must abort
    * the CI diff, not degrade it). Uses only JDK HTTP; EngineSpec
    * drives it against a loopback stub so the zero-egress build
    * still exercises the full path (the request/artifact wire shapes,
    * auth, run selection, and error handling), and pins that swapping
    * this source for the warehouse artifact cannot change a
    * `state:modified+` selection.
    *
    * `baseUrl` replaces the reference's hardcoded
    * `https://cloud.getdbt.com/api/v2` so tests (and self-hosted
    * deployments) can point elsewhere.
    */
  final case class Http(baseUrl: String, apiToken: String,
      accountId: String, jobId: String, runId: Option[String] = None,
      limit: Int = 50) extends ManifestSource {

    private def get(url: String): String = {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestProperty("Authorization", s"Token $apiToken")
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      val status = conn.getResponseCode
      if (status < 200 || status >= 300)
        throw new java.io.IOException(s"HTTP $status from $url")
      val in = conn.getInputStream
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }

    /** First successful run id from the newest-first listing — the
      * reference's get_latest_successful_run (status 10 = success).
      * Minimal regex scan in the repo's no-json-dependency style: the
      * listing entries only need (id, status) pairs.
      */
    private[core] def latestSuccessfulRunId(): Option[String] = {
      val body = get(s"$baseUrl/accounts/$accountId/runs/" +
        s"?job_definition_id=$jobId&limit=$limit&order_by=-finished_at")
      val run = """\{[^{}]*"id"\s*:\s*(\d+)[^{}]*"status"\s*:\s*(\d+)[^{}]*\}""".r
      run.findAllMatchIn(body)
        .collectFirst { case m if m.group(2) == "10" => m.group(1) }
    }

    def fetch(): Option[ManifestState] = {
      val rid = runId.orElse(latestSuccessfulRunId()).getOrElse(
        throw new IllegalStateException(
          s"no successful run found for job $jobId"))
      Some(ManifestState.fromJson(
        get(s"$baseUrl/accounts/$accountId/runs/$rid/artifacts/manifest.json")))
    }

    def describe: String =
      s"dbt-Cloud manifest (account $accountId, job $jobId" +
        runId.fold("")(r => s", run $r") + ")"
  }
}
