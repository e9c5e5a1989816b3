package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Train-once / load-at-query-time lifecycle for the BPE merge table —
  * the same artifact discipline as IvfIndex / PqIndex: the model is
  * `nIters` (pair_a, pair_b) rows trained once over the corpus
  * (TextOps.bpeTopMerges) and applied by every encode query
  * (TextOps.bpeEncode). The file stores one merge per line as
  * iteration<TAB>a<TAB>b<TAB>support — tokens are `\s+`-split words, so
  * they can never contain the tab delimiter.
  */
object BpeModel {

  private val cache = TrieMap.empty[String, Seq[(Int, String, String, Long)]]

  /** Dataset dir most recently asked for merges in this JVM (see
    * IvfIndex.lastSfDir — same oracle-generation contract).
    */
  @volatile private var lastDir: Option[String] = None
  def lastSfDir: Option[String] = lastDir

  def artifactPath(sfDir: String, nIters: Int): Path = {
    val abs = Paths.get(sfDir).toAbsolutePath.normalize.toString
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    IvfIndex.artifactRoot.resolve(s"bpe-${Paths.get(abs).getFileName}-$h-n$nIters.tsv")
  }

  /** Merge table for (sfDir, nIters): cache → artifact → train-once. */
  def mergesFor(sfDir: String, nIters: Int)
               (train: => Seq[(Int, String, String, Long)]): Seq[(Int, String, String, Long)] = {
    lastDir = Some(sfDir)
    cache.getOrElseUpdate(artifactPath(sfDir, nIters).toString, {
      val p = artifactPath(sfDir, nIters)
      if (Files.exists(p)) load(p)
      else {
        val m = train
        persist(p, m)
        m
      }
    })
  }

  /** Merge table if already trained/persisted — never trains. */
  def loadIfPresent(sfDir: String, nIters: Int): Option[Seq[(Int, String, String, Long)]] = {
    val key = artifactPath(sfDir, nIters).toString
    cache.get(key).orElse {
      val p = artifactPath(sfDir, nIters)
      if (Files.exists(p)) {
        val m = load(p)
        cache.putIfAbsent(key, m)
        Some(m)
      } else None
    }
  }

  private def load(p: Path): Seq[(Int, String, String, Long)] =
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val f = line.split("\t", -1)
      require(f.length == 4, s"BPE artifact $p has a malformed line: $line")
      (f(0).toInt, f(1), f(2), f(3).toLong)
    }

  private def persist(p: Path, merges: Seq[(Int, String, String, Long)]): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, p.getFileName.toString, ".tmp")
    Files.write(tmp, merges.map { case (i, a, b, s) => s"$i\t$a\t$b\t$s" }.asJava)
    try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
    catch { // concurrent writer won: theirs is bit-identical (deterministic training)
      case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
    }
  }
}
