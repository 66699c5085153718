package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Reference [[ConditionalPutCommitStore]] adapter: claims manifest
  * versions through an HTTP object endpoint's create-if-absent
  * precondition — the literal wire shape of S3 `PutObject` with
  * `If-None-Match: *` (GCS spells the same precondition
  * `x-goog-if-generation-match: 0`, ABFS a create-path ETag guard; a
  * store-specific subclass only changes the header line).
  *
  * This is the copyable on-ramp for running `graft-atomic` on an
  * object store whose rename is emulated (s3a/gs/wasb/abfs — refused
  * by default, see [[AtomicCommitStores.forFileSystem]]). Wiring:
  *
  * {{{
  * spark.hadoop.graft.atomic.commitStore=graft.sources.HttpConditionalPutCommitStore
  * spark.hadoop.graft.atomic.commitStore.http.endpoint=https://bucket.s3.region.amazonaws.com
  * }}}
  *
  * The object key is the manifest path within the filesystem (so the
  * claimed object is exactly the file `graft-atomic`'s readers open
  * through the FileSystem API afterwards). Semantics required of the
  * endpoint, and verified against a local shim in HttpCommitStoreSpec:
  *
  *   - `2xx` — the object was CREATED with exactly this content; the
  *     caller owns the name. The store must make name AND complete
  *     content visible in one atomic step (real object PUTs do).
  *   - `412 Precondition Failed` (or `409`) — the name already exists:
  *     the caller LOST the claim. This must be the answer for every
  *     concurrent committer but one.
  *   - anything else is an environment error and surfaces as
  *     IOException — never silently treated as a lost race (the
  *     publish loop would spin through its retries with a misleading
  *     "contention" failure, the same misclassification
  *     [[RenameCommitStore]] guards against).
  *
  * Auth is deliberately out of scope here: production S3/GCS requests
  * need SigV4/OAuth signing, which the cloud SDKs provide — substitute
  * the `send` with the SDK call (`PutObject(ifNoneMatch = "*")` is one
  * line) and keep the status mapping.
  */
class HttpConditionalPutCommitStore extends ConditionalPutCommitStore {

  override def putIfAbsent(fs: FileSystem, dst: Path, content: Array[Byte]): Boolean = {
    val endpoint = Option(fs.getConf.get(HttpConditionalPutCommitStore.EndpointKey))
      .getOrElse(throw new IllegalArgumentException(
        s"HttpConditionalPutCommitStore needs hadoop conf " +
          s"'${HttpConditionalPutCommitStore.EndpointKey}' (the object " +
          "endpoint base URL) to claim manifest versions"))
    val key = fs.makeQualified(dst).toUri.getPath
    // Build the target through the multi-arg URI constructor so a key
    // with URI-special characters (spaces, '%', non-ASCII partition
    // values) is percent-encoded instead of blowing up URI.create with
    // an IllegalArgumentException mid-commit-loop. Malformed endpoint
    // conf still surfaces, but as a clean IOException.
    val target =
      try {
        val base = URI.create(endpoint.stripSuffix("/"))
        new URI(base.getScheme, base.getAuthority,
          base.getPath.stripSuffix("/") + key, null, null)
      } catch {
        case e @ (_: java.net.URISyntaxException | _: IllegalArgumentException) =>
          throw new IOException(
            s"cannot build conditional-PUT target from endpoint '$endpoint' " +
              s"and key '$key'", e)
      }
    val req = HttpRequest.newBuilder(target)
      .header("If-None-Match", "*")
      .timeout(HttpConditionalPutCommitStore.RequestTimeout)
      .PUT(HttpRequest.BodyPublishers.ofByteArray(content))
      .build()
    val resp =
      try HttpConditionalPutCommitStore.client.send(
        req, HttpResponse.BodyHandlers.discarding())
      catch {
        case e: InterruptedException => throw new IOException(
          s"conditional PUT of ${fs.makeQualified(dst)} interrupted", e)
      }
    resp.statusCode() match {
      case c if c >= 200 && c < 300 => true // created: this committer owns the name
      case 412 | 409 => false               // precondition failed: lost the claim
      case c => throw new IOException(
        s"conditional PUT of ${fs.makeQualified(dst)} returned HTTP $c — " +
          "an environment error, not claim contention; refusing to retry " +
          "it as a race")
    }
  }
}

object HttpConditionalPutCommitStore {
  /** Hadoop conf key: base URL of the conditional-PUT object endpoint. */
  val EndpointKey = "graft.atomic.commitStore.http.endpoint"
  /** Bounded connect + per-request deadlines: a stalled endpoint must
    * surface as an IOException (HttpTimeoutException) the claim loop
    * classifies as environmental — never hang the commit forever. */
  private[sources] val ConnectTimeout = java.time.Duration.ofSeconds(10)
  private[sources] val RequestTimeout = java.time.Duration.ofSeconds(60)
  private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(ConnectTimeout).build()
}
