package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/vector primitives for the dataset-scale operators
  * (dedup, similarity, text analysis). All are pure built-in expression
  * trees — whole-stage-codegen'd, no UDFs — and every one is designed to
  * be bit-reproducible against an independent ANSI-SQL implementation
  * (the DuckDB oracle): integer or string intermediates wherever an
  * engine could otherwise differ in float rounding or aggregation order.
  */
object TextPrimitives {

  /** Whitespace tokens, in document order. */
  def tokens(text: Column): Column = split(text, " ")

  /** Ordered word k-shingles (k-grams of tokens joined by single
    * spaces). Empty array when the document has fewer than k tokens —
    * guarded because Spark's `sequence(0, n)` runs DESCENDING for n<0.
    */
  def shingles(words: Column, k: Int): Column =
    when(size(words) >= k,
      transform(sequence(lit(0), size(words) - k),
        i => concat_ws(" ", slice(words, i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** One MinHash value: the lexicographic minimum over the shingle set
    * of hash_seed(shingle), where hash_seed is a non-overlapping
    * 5-hex-char window of `md5(k|shingle)` (seed = 6k + window). Each
    * window of a well-mixed hash is an independent uniform hash of the
    * shingle, so 12 seeds cost only TWO md5 evaluations per shingle
    * instead of twelve — md5 is the dominant cost of the LSH pipeline.
    * Hex-string min is engine-portable (identical in any engine with
    * md5/substr), unlike integer-hash minima which would need a shared
    * 64-bit hash. NULL for empty shingle sets.
    */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol,
      x => md5(concat(lit(s"${seed / 6}|"), x)).substr((seed % 6) * 5 + 1, 5)))

  /** LSH band signature: concatenation of `rows` consecutive minhashes
    * starting at `firstSeed`. Two documents land in the same bucket for
    * a band iff all `rows` minhashes agree — the standard banding
    * amplification (prob. of bucket collision = jaccard^rows per band).
    */
  def band(shingleCol: Column, firstSeed: Int, rows: Int): Column =
    concat((firstSeed until firstSeed + rows).map(s => minhash(shingleCol, s)): _*)

  /** Per-shingle hash material, computed ONCE: the 64-hex concat of the
    * two seeded md5s. All 12 minhash windows are substrings of this —
    * crucial because Spark does NOT common-subexpression-eliminate an
    * md5 repeated across different higher-order-function lambdas, so
    * deriving each band directly from the shingles recomputes every
    * md5 12×.
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol,
      x => concat(md5(concat(lit("0|"), x)), md5(concat(lit("1|"), x))))

  /** [[minhash]] over precomputed [[shingleHashes]] material (seed s →
    * chars [(s/6)*32 + (s%6)*5 + 1, +5) — identical values).
    */
  def minhashFromHashes(shhCol: Column, seed: Int): Column =
    array_min(transform(shhCol,
      h => h.substr((seed / 6) * 32 + (seed % 6) * 5 + 1, 5)))

  /** [[band]] over precomputed [[shingleHashes]] material. */
  def bandFromHashes(shhCol: Column, firstSeed: Int, rows: Int): Column =
    concat((firstSeed until firstSeed + rows).map(s => minhashFromHashes(shhCol, s)): _*)

  /** 16-bit SimHash rendered as a '0'/'1' string (portable across
    * engines; no bit-twiddling builtins needed). Bit i is the sign of
    * the sum over tokens (with multiplicity) of +-1 according to the
    * high bit of the i-th hex nibble of md5(token).
    */
  def simhash16(tokensCol: Column): Column =
    concat_ws("",
      transform(sequence(lit(1), lit(16)), i =>
        when(
          aggregate(tokensCol, lit(0),
            (acc, t) => acc + when(md5(t).substr(i, lit(1)) >= "8", 1).otherwise(-1))
            >= 0, "1").otherwise("0")))

  /** Jaccard similarity of the DISTINCT element sets of two arrays,
    * via |A∩B| = |A|+|B|-|A∪B| — needs only distinct/size/concat, all
    * of which have exact ANSI-SQL equivalents (no reliance on any
    * engine's array_intersect null/dup semantics).
    */
  def jaccard(a: Column, b: Column): Column = {
    val na = size(array_distinct(a))
    val nb = size(array_distinct(b))
    val nu = size(array_distinct(concat(a, b)))
    // two empty sets (docs shorter than the shingle width) define 0.0,
    // not 0/0: such docs must not near-dup-pair via shingles — exact
    // dedup owns identical-empty handling
    when(nu === 0, lit(0.0))
      .otherwise((na + nb - nu).cast("double") / nu.cast("double"))
  }

  /** Embedding quantized to exact 1e-6 fixed-point longs. All cosine
    * math downstream runs on these integers, so Spark and any oracle
    * produce bit-identical similarities regardless of float summation
    * order (the 1e-6 quantization error is far below any useful
    * similarity threshold).
    */
  def quantized(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * 1e6).cast("long"))

  /** Exact integer dot product of two quantized vectors — the native
    * codegen'd expression ([[graft.functions.LongArrayDot]]); requires
    * `GraftFunctions.register(spark)` (operators do this themselves).
    * [[qdotPortable]] is the pure-built-in equivalent (allocates an
    * intermediate array per row — ~3× slower on pairwise joins).
    */
  def qdot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.qdotNative(a, b)

  /** Built-ins-only dot product (no registration needed). */
  def qdotPortable(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity from quantized vectors: exact integer dot/norms,
    * one final double division (IEEE-deterministic given equal inputs).
    * Prefer [[qcosinePre]] in pairwise joins — it takes norms
    * precomputed once per vector instead of recomputing two full
    * aggregates per PAIR (3× the work on an O(n²) join).
    */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b).cast("double") /
      (sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double")))

  /** Per-vector norm for precomputation: sqrt of the exact integer
    * self-dot. Same expression shape as inside [[qcosine]], so results
    * are bit-identical.
    */
  def qnorm(a: Column): Column = sqrt(qdot(a, a).cast("double"))

  /** Cosine from a pairwise dot + precomputed norms. */
  def qcosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    qdot(a, b).cast("double") / (normA * normB)

  /** Sign-bit LSH bucket for ANN: the signs of the first `bits`
    * dimensions as a '0'/'1' string. Random-hyperplane LSH with
    * axis-aligned planes — engine-portable (no shared RNG needed) and
    * a real spatial partitioner for normalized embeddings.
    */
  def signBucket(embedding: Column, bits: Int): Column =
    concat_ws("",
      transform(slice(embedding, 1, bits),
        x => when(x >= 0, "1").otherwise("0")))
}
