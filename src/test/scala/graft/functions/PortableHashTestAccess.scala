package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Test-only bridge to the package-private portable hash. */
object PortableHashTestAccess {
  def md5hash60(s: String): Long = PortableHash.md5hash60(UTF8String.fromString(s))
}
