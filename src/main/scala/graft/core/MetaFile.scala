package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic metadata-file protocol every manifest and ref in the
  * repo commits through — single-sourced so the durability discipline
  * (and any future fix to it) cannot drift between its users
  * (TimeTravel manifests, the vector-index manifests in
  * operators/Ann.scala, Branches refs):
  *
  *  - WRITE: stage the content at `.name.__tmp`, then ONE rename onto
  *    the target — the rename IS the commit point; before it, readers
  *    resolve whatever was previously committed, and a crash leaves
  *    only a dot-tmp no lister matches.
  *  - READ: a full byte copy through the Hadoop FS layer (works on
  *    any warehouse filesystem, never assumes local files).
  *
  * NOT for CAS slots: Occ's publish relies on rename-to-existing
  * FAILING (the compare half of compare-and-swap); this helper's
  * contract is last-write-wins on a fresh slot.
  */
object MetaFile {

  /** Write `content` at `dir/name` via the tmp + atomic-rename
    * protocol. `err` names the failed commit in the caller's terms.
    */
  def writeAtomic(fs: FileSystem, dir: Path, name: String, content: String,
      err: => String): Unit = {
    fs.mkdirs(dir)
    val target = new Path(dir, name)
    val tmp = new Path(dir, s".$name.__tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, target), err)
  }

  /** Read a metadata file fully as UTF-8. */
  def read(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 8192, false)
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
  }
}
