package graft.sources

/** Content fingerprints for model-derived artifact paths (ADVICE r17
  * item 5): the write-once stores ([[PqCodeStore]], [[IvfClusterStore]])
  * key their paths by model PARAMETERS (k, iters, dir hash) — but a
  * same-shape retrain (regenerated dataset, retrained quantizer at the
  * same k/iters) produces DIFFERENT centroids/codebooks at the SAME
  * parameters, and the write-once contract would keep serving the stale
  * artifact forever. Folding an 8-hex digest of the model's float
  * content into the path makes a content change land at a new path; the
  * arrays are driver-side and a few KB, so the digest is free.
  */
object ModelKeys {

  /** 8-hex MD5 of the concatenated IEEE-754 bits of every float, in
    * array order — any centroid/codebook change changes the key.
    */
  private[sources] def fingerprint(arrays: Array[Array[Float]]*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(4)
    arrays.foreach(_.foreach(_.foreach { f =>
      bb.clear()
      bb.putInt(java.lang.Float.floatToIntBits(f))
      md.update(bb.array())
    }))
    md.digest().take(4).map("%02x".format(_)).mkString
  }

  /** [[fingerprint]] over a codebook set (m sub-spaces × k codes). */
  private[sources] def fingerprintBooks(codebooks: Array[Array[Array[Float]]]): String =
    fingerprint(codebooks.flatten)
}
