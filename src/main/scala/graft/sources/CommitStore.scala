package graft.sources

import java.io.IOException
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}

/** The ONE primitive `graft-atomic`'s commit protocol needs from a
  * storage system: claim a version name exactly once. Everything else
  * in the protocol (manifest folding, tags, retries, read fallback) is
  * store-independent driver logic; this seam is the LogStore-style
  * plug point (the shape Delta Lake uses for the same problem).
  *
  * Contract: `tryClaim(fs, tmp, dst)` must atomically make the COMPLETE
  * content written at `tmp` visible under `dst` IFF `dst` does not
  * already exist, returning true to exactly ONE caller per `dst` across
  * all concurrent committers (processes included). `tmp` is consumed
  * either way — moved on a win, deleted on a loss. A store that cannot
  * honor the exactly-one-winner guarantee must not exist for that
  * scheme: [[AtomicCommitStores.forFileSystem]] refuses such schemes
  * loudly instead of silently losing updates.
  */
trait ManifestCommitStore {
  def tryClaim(fs: FileSystem, tmp: Path, dst: Path): Boolean
}

/** Claim for filesystems with a truly atomic exclusive-create or
  * no-overwrite-rename primitive:
  *
  *  - **HDFS/viewfs/webhdfs**: `FileContext.rename` without OVERWRITE —
  *    the NameNode applies the dest-must-not-exist check and the move
  *    in one namespace operation, so exactly one committer wins.
  *  - **local (`file`)**: POSIX hard-link creation (`link(2)`), the one
  *    primitive the local FS offers that is atomic AND exclusive.
  *    `rename(2)` silently OVERWRITES an existing dest, and Hadoop's
  *    `overwrite=false` local rename/create is a client-side
  *    check-then-act — two racing committers can both pass the check,
  *    and with ChecksumFileSystem's `.crc` sidecars the interleaved
  *    double-rename can even marry one claim's data to the other's
  *    checksum, poisoning the version file for every later reader
  *    (caught by CommitStoreSpec's stress race before this switch).
  *    `Files.createLink(dst, tmp)` fails `EEXIST` atomically in the
  *    kernel and publishes the COMPLETE tmp content or nothing.
  *
  * NOT valid on object stores: S3A/GCS/WASB emulate rename as
  * HEAD+COPY+DELETE, where two concurrent committers can both pass the
  * HEAD check and both "win" — the lost update
  * [[AtomicCommitStores.forFileSystem]] exists to refuse. */
object RenameCommitStore extends ManifestCommitStore {
  override def tryClaim(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    val claimed =
      if (scheme == "file") {
        val tmpNio = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
        val dstNio = java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath)
        try { java.nio.file.Files.createLink(dstNio, tmpNio); true }
        catch {
          // EEXIST (= lost the name race) surfaces as this exact type;
          // any other errno — EPERM on a mount without hard-link
          // support, EXDEV, EROFS — is an environment failure, and
          // swallowing it as "contention" would spin the publish loop
          // through MaxCommitRetries with a misleading error
          case _: java.nio.file.FileAlreadyExistsException => false
          case e: IOException =>
            if (java.nio.file.Files.exists(dstNio)) false // raced: name taken
            else {
              fs.delete(tmp, false)
              throw new IOException(
                s"hard-link claim on $dstNio failed for a reason other than " +
                  "name contention — does this filesystem support hard links? " +
                  "If not, configure a ConditionalPutCommitStore via hadoop " +
                  s"conf '${AtomicCommitStores.ConfKey}'.", e)
            }
        }
      } else {
        val fc = FileContext.getFileContext(
          fs.makeQualified(dst.getParent).toUri, fs.getConf)
        try { fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst)); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: IOException =>
            if (fs.exists(dst)) false // raced: name taken
            else {
              fs.delete(tmp, false)
              throw new IOException(
                s"rename claim on ${fs.makeQualified(dst)} failed for a " +
                  "reason other than name contention (quota? permissions? " +
                  "safe-mode?) — surfacing instead of retrying as a race", e)
            }
        }
      }
    // consumed either way: a winner's content lives on under dst (the
    // hard link shares the inode; the HDFS rename moved it), a loser's
    // is discarded — and the delete also clears any .crc sidecar, so a
    // local dst never carries a mismatched checksum
    fs.delete(tmp, false)
    claimed
  }
}

/** Atomic claim of a DIRECTORY name — the table-grain sibling of
  * [[RenameCommitStore]] (hard links cannot bind directories, so the
  * primitive necessarily differs per scheme, but the contract and the
  * loser semantics are identical: the COMPLETE directory appears under
  * `dst` for exactly one claimant, `tmp` is consumed either way).
  *
  *  - **local (`file`)**: `java.nio.file.Files.move(…, ATOMIC_MOVE)` —
  *    a pure `rename(2)`, which fails cleanly (ENOTEMPTY/EEXIST) when
  *    the dest was already published. Hadoop's own local rename is NOT
  *    usable here: both FileSystem.rename and FileContext-over-
  *    RawLocalFileSystem do a client-side dest-exists check, and on the
  *    losing interleaving `RawLocalFileSystem.rename` falls back to
  *    `FileUtil.copy`, which nests the loser's tmp directory INSIDE the
  *    just-published table — persistently poisoning it for every later
  *    reader (conflicting-directory errors / double-counted rows).
  *  - **HDFS-family**: `FileContext.rename` without OVERWRITE — the
  *    NameNode applies dest-must-not-exist and the move in one
  *    namespace operation, for directories as for files.
  *  - **object stores**: refused loudly — there are no directories to
  *    rename; a table-grain claim there needs a marker-object protocol
  *    on top of [[ConditionalPutCommitStore]] (publish the directory
  *    listing as the marker's content), which no caller requires yet.
  */
object AtomicDirectoryClaim {
  def tryClaim(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    val won =
      if (scheme == "file") {
        val tmpNio = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
        val dstNio = java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath)
        try {
          java.nio.file.Files.move(tmpNio, dstNio,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch {
          case e: IOException =>
            // rename(2) refuses an existing dest with ENOTEMPTY/EEXIST;
            // anything else (EXDEV cross-device, permissions) is an
            // environment error, not contention
            if (java.nio.file.Files.exists(dstNio)) false
            else {
              fs.delete(tmp, true)
              throw new IOException(
                s"directory claim $tmpNio -> $dstNio failed for a reason " +
                  "other than name contention (cross-device scratch? " +
                  "permissions?) — surfacing instead of retrying", e)
            }
        }
      } else if (AtomicCommitStores.AtomicRenameSchemes(scheme)) {
        val fc = FileContext.getFileContext(
          fs.makeQualified(dst.getParent).toUri, fs.getConf)
        try { fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst)); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: IOException =>
            if (fs.exists(dst)) false
            else {
              fs.delete(tmp, true)
              throw new IOException(
                s"directory claim on ${fs.makeQualified(dst)} failed for a " +
                  "reason other than name contention", e)
            }
        }
      } else throw new UnsupportedOperationException(
        s"cannot claim a directory atomically on scheme '$scheme' — its " +
          "rename is emulated (HEAD+COPY). Point the scratch/table root at " +
          "a shared POSIX/HDFS filesystem, or publish through graft-atomic " +
          "with a ConditionalPutCommitStore instead of a directory claim.")
    if (!won) fs.delete(tmp, true)
    won
  }
}

/** Conditional-PUT claim for object stores: adapt the store's
  * create-if-absent primitive (`If-None-Match: *` on S3 PutObject,
  * `x-goog-if-generation-match: 0` on GCS, a create-path ETag
  * precondition on ABFS) to the claim contract. The PUT itself is the
  * atomicity event — the object appears with complete content or not
  * at all, and the precondition guarantees exactly one winner — so no
  * rename is involved anywhere. Subclasses implement ONLY
  * [[putIfAbsent]] against their store's SDK; the tmp-file plumbing is
  * shared here. (No object-store SDK ships in this build, so the repo
  * carries the seam plus an in-memory simulation in AtomicSinkSpec
  * proving the protocol safe over a non-atomic-rename filesystem;
  * a production S3 store is `putIfAbsent = PutObject(IfNoneMatch:"*")`,
  * one call.) */
abstract class ConditionalPutCommitStore extends ManifestCommitStore {
  /** Create `dst` with exactly `content` iff `dst` does not exist.
    * Atomic, exactly one winner per name across all committers, AND
    * all-or-nothing on content: the name must NEVER be observable with
    * partial content (real object-store PUTs guarantee this; a torn
    * claim would make a concurrent committer fold from an older
    * version — a lost update). */
  def putIfAbsent(fs: FileSystem, dst: Path, content: Array[Byte]): Boolean

  final override def tryClaim(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
    val in = fs.open(tmp)
    val content =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    val won = putIfAbsent(fs, dst, content)
    fs.delete(tmp, false)
    won
  }
}

/** Store selection: refuse-by-default on schemes whose rename contract
  * is emulated, with a Hadoop-conf override naming a
  * [[ManifestCommitStore]] implementation. */
object AtomicCommitStores {
  /** Hadoop conf key: fully-qualified class name (no-arg constructor)
    * of the [[ManifestCommitStore]] to use. Set it per job
    * (`spark.hadoop.graft.atomic.commitStore=...`) to commit through a
    * conditional-PUT store on S3/GCS/ABFS. */
  val ConfKey = "graft.atomic.commitStore"

  /** Schemes whose FileSystem rename is atomic with the
    * dest-must-not-exist contract — the ONLY schemes RenameCommitStore
    * is sound on. (`null` scheme = default/local FS.) */
  val AtomicRenameSchemes: Set[String] =
    Set("file", "hdfs", "viewfs", "webhdfs", "har")

  def forFileSystem(fs: FileSystem, conf: Configuration): ManifestCommitStore =
    Option(conf.get(ConfKey)) match {
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor().newInstance()
          .asInstanceOf[ManifestCommitStore]
      case None =>
        val scheme = Option(fs.getUri.getScheme).getOrElse("file")
        if (AtomicRenameSchemes(scheme)) RenameCommitStore
        else throw new UnsupportedOperationException(
          s"graft-atomic: cannot commit on scheme '$scheme' — its rename " +
            "is emulated (HEAD+COPY), so two concurrent committers could " +
            "both claim a version and silently lose an append. Configure " +
            s"a conditional-PUT commit store via hadoop conf '$ConfKey' " +
            "(subclass graft.sources.ConditionalPutCommitStore; " +
            "If-None-Match:* on S3, if-generation-match:0 on GCS).")
    }
}
