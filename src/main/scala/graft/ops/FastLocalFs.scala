package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without the chmod FORK.
  *
  * Hadoop's RawLocalFileSystem, when the native hadoop library is not
  * loadable (this sandbox, most laptops, many containers), implements
  * `setPermission` by forking a `chmod` subprocess — and `create()`
  * calls `setPermission` for EVERY file. A table-format commit
  * protocol creates many small files (markers, `_files`, metadata
  * frames, parquet parts, checksum sidecars), so the protocol's floor
  * was paying one process fork per file: sampled 25% of a MoR-update
  * loop's main-thread wall inside `java.lang.ProcessImpl.forkAndExec`
  * (guide §7.3 — the driver doing invisible single-threaded work).
  *
  * [[NioRawLocalFileSystem]] overrides `setPermission` with
  * `java.nio.file.Files.setPosixFilePermissions` — same chmod, no
  * fork; non-POSIX stores fall back to the shell path.
  * [[FastLocalFileSystem]] is the checksummed `file://` wrapper over
  * it, a drop-in for `fs.file.impl`: checksum semantics, directory
  * layout and permissions are IDENTICAL to stock Hadoop — only the
  * syscall mechanism changes. */
class NioRawLocalFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    // setuid/setgid/sticky bits are NOT expressible through
    // PosixFilePermission — masking them off would silently change the
    // mode (ADVICE r15: the documented fallback never triggered
    // because plain POSIX chmod does not throw). Route them to the
    // stock forking path up front, exactly as the contract promises.
    if ((permission.toShort & ~0x1ff) != 0) {
      super.setPermission(p, permission)
      return
    }
    try {
      import java.nio.file.attribute.PosixFilePermission._
      val perms = java.util.EnumSet
        .noneOf(classOf[java.nio.file.attribute.PosixFilePermission])
      val s: Int = permission.toShort & 0x1ff
      if ((s & 0x100) != 0) perms.add(OWNER_READ)
      if ((s & 0x080) != 0) perms.add(OWNER_WRITE)
      if ((s & 0x040) != 0) perms.add(OWNER_EXECUTE)
      if ((s & 0x020) != 0) perms.add(GROUP_READ)
      if ((s & 0x010) != 0) perms.add(GROUP_WRITE)
      if ((s & 0x008) != 0) perms.add(GROUP_EXECUTE)
      if ((s & 0x004) != 0) perms.add(OTHERS_READ)
      if ((s & 0x002) != 0) perms.add(OTHERS_WRITE)
      if ((s & 0x001) != 0) perms.add(OTHERS_EXECUTE)
      java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, perms)
      ()
    } catch {
      // non-POSIX filesystems, races: the stock (forking) path is the
      // behaviour-exact fallback
      case _: UnsupportedOperationException |
           _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }
}

class FastLocalFileSystem
    extends org.apache.hadoop.fs.LocalFileSystem(
      new NioRawLocalFileSystem)
