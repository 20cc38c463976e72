package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Tight-loop numeric kernels invoked from both interpreted `eval` and
  * whole-stage-generated Java (top-level object ⇒ static forwarders, so
  * generated code can call `graft.functions.VectorKernels.cosine(a, b)`).
  *
  * All accumulation is in Double regardless of element type; inputs are the
  * engine's `ARRAY<FLOAT>` embedding columns (dimension is data-defined —
  * 64 in the test fixtures, 1536 in the reference's
  * `EmbeddingConfig.java:5`).
  */
object VectorKernels {

  /** Dimension check shared by all binary kernels: a silent truncation to
    * min(len) would mask data corruption with plausible-looking scores, so
    * mismatched inputs fail loudly instead (ADVICE r1).
    */
  private def sameDim(a: ArrayData, b: ArrayData, op: String): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$op: vector dimensions differ (${n} vs ${b.numElements()})")
    n
  }

  /** Null-returning cosine for dirty corpora: one malformed embedding must
    * not kill a 10-hour 100 TB job — the row scores NULL and a downstream
    * `IS NOT NULL` quarantines it. The throwing [[cosine]] stays the
    * default (fail loudly when dimensions SHOULD agree).
    */
  def tryCosine(a: ArrayData, b: ArrayData): java.lang.Double =
    if (a.numElements() != b.numElements()) null
    else java.lang.Double.valueOf(cosine(a, b))

  /** Cosine similarity of two float arrays; 0.0 for zero-norm inputs. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = sameDim(a, b, "cosine_sim")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Symmetric int8 quantization: q[i] = round(127 * v[i] / max|v|).
    * COSINE is invariant to a per-vector positive scale, so no scale
    * needs storing — the quantized BINARY column alone supports
    * [[cosineI8]] scoring at 1/4 the bytes of ARRAY<FLOAT>.
    */
  def quantizeI8(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var m = 0f
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i)); if (x > m) m = x; i += 1
    }
    if (m == 0f) return out
    val s = 127f / m
    i = 0
    while (i < n) { out(i) = math.round(v.getFloat(i) * s).toByte; i += 1 }
    out
  }

  /** Cosine similarity of two int8-quantized vectors — pure integer
    * accumulation (exact, order-independent) with one double division.
    */
  def cosineI8(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"cosine_sim_i8: dimension mismatch ${a.length} vs ${b.length}")
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toLong; val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Morton/Z-order interleave of the low 16 bits of two ints into one
    * 32-bit key (bit i of `a` → bit 2i, bit i of `b` → bit 2i+1). The
    * classic bit-spread: at 100 TB, sorting a table by this key before a
    * range-partitioned write clusters rows that are close in BOTH
    * dimensions into the same files, so min/max file statistics prune 2-D
    * box predicates — multi-dimensional clustering with a 1-D sort.
    */
  def interleave16(a: Int, b: Int): Long = {
    var x = (a & 0xffff).toLong
    var y = (b & 0xffff).toLong
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    y = (y | (y << 8)) & 0x00ff00ffL
    y = (y | (y << 4)) & 0x0f0f0f0fL
    y = (y | (y << 2)) & 0x33333333L
    y = (y | (y << 1)) & 0x55555555L
    x | (y << 1)
  }

  /** Dot product of two float arrays. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = sameDim(a, b, "vector_dot")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** L2 norm of a float array. */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** PQ code assignment: index of the L2-nearest codeword to `sv` in
    * subspace `sub` of the nested codebook `cbAll` (sub → code → float
    * vector). Fixed scan order + strict `<` make ties deterministic
    * (smallest index wins). One tight loop per row — the codegen'd
    * replacement for a store×ksub join fan-out at encode time.
    */
  def pqArgmin(sv: ArrayData, sub: Int, cbAll: ArrayData): Int = {
    val cb = cbAll.getArray(sub)
    val k = cb.numElements()
    val n = sv.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val cw = cb.getArray(c)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = sv.getFloat(i).toDouble - cw.getFloat(i).toDouble
        s += d * d; i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Euclidean (L2) distance of two float arrays. */
  def l2Distance(a: ArrayData, b: ArrayData): Double = {
    val n = sameDim(a, b, "l2_distance")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  /** FNV-1a 64-bit over a string's UTF-16 code units with a seed mix —
    * deterministic across JVMs (no dependence on String.hashCode).
    */
  def fnv1a64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      h ^= (c & 0xff); h *= 0x100000001b3L
      h ^= ((c >> 8) & 0xff); h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Deterministic signed-feature-hash embedding of a text into `dim`
    * L2-normalized float buckets (offline stand-in for the reference's
    * OpenAI embedding calls, `StreamingStoreKnowledge.java:94`):
    * lowercase, split on non-alphanumerics, hash each token, add ±1 into
    * `hash mod dim`, L2-normalize (⇒ cosine == dot on outputs).
    */
  def featureHashEmbed(text: String, dim: Int, seed: Long): ArrayData = {
    val acc = new Array[Double](dim)
    val s = text.toLowerCase
    var start = -1
    var i = 0
    val len = s.length
    while (i <= len) {
      val isWord = i < len && {
        val c = s.charAt(i); Character.isLetterOrDigit(c)
      }
      if (isWord) { if (start < 0) start = i }
      else if (start >= 0) {
        val h = fnv1a64(s.substring(start, i), seed)
        val bucket = ((h % dim) + dim) % dim
        acc(bucket.toInt) += (if ((h & 0x8000000000000000L) == 0L) 1.0 else -1.0)
        start = -1
      }
      i += 1
    }
    var nrm = 0.0
    i = 0
    while (i < dim) { nrm += acc(i) * acc(i); i += 1 }
    nrm = math.sqrt(nrm)
    val out = new Array[Float](dim)
    if (nrm > 0.0) { i = 0; while (i < dim) { out(i) = (acc(i) / nrm).toFloat; i += 1 } }
    new GenericArrayData(out)
  }

  /** Deterministic pseudo-random hyperplanes for [[lshBucket]], cached per
    * (dim, nbits, seed). Component values are fnv-derived in [-1, 1] — no
    * RNG state, so every executor regenerates identical planes.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()

  private def planes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim, nbits, seed), { _ =>
      Array.tabulate(nbits, dim) { (j, i) =>
        ((fnv1a64(s"$j:$i", seed) % 2001L + 2001L) % 2001L - 1000L) / 1000.0
      }
    })

  /** Random-hyperplane LSH bucket of a vector: bit j = sign of the dot
    * product with deterministic hyperplane j. Cosine-similar vectors land
    * in buckets with small Hamming distance — the ANN pre-filter that
    * replaces a full scan at 100 TB (probe bucket ± a few flipped bits).
    */
  def lshBucket(v: ArrayData, nbits: Int, seed: Long): Int = {
    val dim = v.numElements()
    val ps = planes(dim, nbits, seed)
    var bucket = 0
    var j = 0
    while (j < nbits) {
      val p = ps(j)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v.getFloat(i).toDouble * p(i); i += 1 }
      if (dot > 0.0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature over n-word shingles of a whitespace-tokenized
    * text: each shingle is string-hashed ONCE, then the k lanes are
    * derived with splitmix64 streams (h + j·φ, finalized) — O(shingles)
    * string work + O(k·shingles) integer mixes, instead of k full string
    * hashes per shingle. Returns empty when the text has < n tokens
    * (callers must filter, or empty signatures collide).
    */
  def minhashShingles(text: String, k: Int, n: Int, seed: Long): ArrayData = {
    require(k > 0 && n > 0, s"minhash_shingles(k=$k, n=$n): need k>0, n>0")
    // token start/end offsets of the space-separated tokens
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val len = text.length
    var i = 0
    var inTok = false
    while (i <= len) {
      val isSep = i == len || text.charAt(i) == ' '
      if (!isSep && !inTok) { starts += i; inTok = true }
      else if (isSep && inTok) inTok = false
      i += 1
    }
    val nTok = starts.length
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s + n <= nTok) {
      // hash the shingle = tokens s..s+n-1 joined by one space, without
      // materializing the substring (token chars + single separators)
      var h = 0xcbf29ce484222325L ^ seed
      var t = s
      while (t < s + n) {
        var p = starts(t)
        while (p < len && text.charAt(p) != ' ') {
          val c = text.charAt(p)
          h ^= (c & 0xff); h *= 0x100000001b3L
          h ^= ((c >> 8) & 0xff); h *= 0x100000001b3L
          p += 1
        }
        if (t < s + n - 1) { h ^= ' '.toInt & 0xff; h *= 0x100000001b3L; h ^= 0; h *= 0x100000001b3L }
        t += 1
      }
      var j = 0
      while (j < k) {
        val x = mix64(h + j * 0x9e3779b97f4a7c15L)
        if (x < mins(j)) mins(j) = x
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(_.asInstanceOf[Any]))
  }

  /** 64-bit SimHash document sketch: tokenize (lowercased letter/digit
    * runs), FNV-1a-hash each token, per-bit majority vote over token
    * hashes. Near-duplicate texts land within small Hamming distance —
    * the pairwise-free dedup sketch for 100 TB corpora (compare via
    * `bit_count(a ^ b)` after a cheap band/prefix bucketing).
    */
  def simhash64(text: String, seed: Long): Long = {
    val votes = new Array[Int](64)
    val s = text.toLowerCase
    var start = -1
    var i = 0
    val len = s.length
    while (i <= len) {
      val isWord = i < len && Character.isLetterOrDigit(s.charAt(i))
      if (isWord) { if (start < 0) start = i }
      else if (start >= 0) {
        val h = fnv1a64(s.substring(start, i), seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        start = -1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Winnowing document fingerprint (rolling hash): hash every k-gram of
    * characters, slide a window of `w` consecutive k-gram hashes, keep each
    * window's minimum (rightmost on ties), return the distinct selected
    * hashes sorted ascending. Standard winnowing guarantees: any shared
    * substring of length >= w + k - 1 yields a shared fingerprint.
    */
  def winnowFingerprint(text: String, k: Int, w: Int, seed: Long): ArrayData = {
    require(k > 0 && w > 0, s"winnow_fingerprint(k=$k, w=$w): need k>0, w>0")
    val n = text.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = fnv1a64(text.substring(i, i + k), seed); i += 1 }
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    var p = 0
    val last = math.max(0, m - w)
    while (p <= last) {
      val wEnd = math.min(p + w, m)
      var best = p
      var j = p + 1
      while (j < wEnd) { if (hs(j) <= hs(best)) best = j; j += 1 }
      sel += hs(best)
      p += 1
    }
    new GenericArrayData(sel.toArray.map(_.asInstanceOf[Any]))
  }

  /** Word n-grams of a space-separated text, document order, duplicates
    * kept: the i-th gram is tokens i..i+n-1 joined by one space. Matches
    * `string_split(text, ' ')`-based SQL exactly (empty tokens from
    * consecutive/trailing spaces are preserved). One split + one linear
    * pass — the HOF formulation (`transform(sequence(...), i ->
    * concat_ws(' ', element_at(split(text, ' '), i), ...))`) re-runs
    * `split` per element reference and measured 40×+ slower on corpus
    * scans.
    */
  def wordNgrams(text: String, n: Int): ArrayData = {
    require(n > 0, s"word_ngrams(n=$n): need n>0")
    val toks = text.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fixed-size overlapping character chunks: windows of `size` chars
    * starting every `size - overlap` chars; final partial window kept.
    */
  def chunks(text: String, size: Int, overlap: Int): ArrayData = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"chunks(size=$size, overlap=$overlap): need size>0 and 0<=overlap<size")
    val stride = size - overlap
    val n = text.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    var done = false
    while (!done) {
      val end = math.min(pos + size, n)
      out += org.apache.spark.unsafe.types.UTF8String.fromString(
        text.substring(pos, end))
      if (end >= n) done = true else pos += stride
    }
    new GenericArrayData(out.toArray)
  }
}
