package graft.operators

/** Count-min sketch geometry, shared by the batch (q_approx_topk,
  * Relational.scala) and streaming (q_stream_approx_topk,
  * streaming/Streams.scala) rows — ONE definition of (d, w, cell
  * hashing, error bound) so the twin rows can never drift apart: the
  * whole point of the streaming row is that it maintains THE SAME
  * sketch incrementally, and that claim is only checkable if both
  * rows share the geometry by construction.
  *
  * The sketch is mergeable by construction — cell counts are sums, so
  * two sketches over disjoint event sets cell-wise summed equal the
  * sketch over the union (the property that makes CMS the
  * distributed/streaming sketch: executors build partial sketches,
  * the merge is an integer add). CmsSpec pins it on real data.
  */
private[graft] object Cms {

  /** Hash rows (depth d): a key's estimate is the MIN over its d
    * cells; collision probability decays as (collision rate)^d. */
  val D = 4

  /** Buckets per row (width w): one-sided overcount ~ N/w expected
    * per colliding cell. d·w cells total (≤262k, ~5 MB finished). */
  val W = 65536

  /** Spark SQL fragment: the d (row, bucket) cells `keyCol` maps to —
    * row i buckets by xxhash64(key, seed = i). */
  def buckets(keyCol: String): String =
    s"transform(sequence(0, ${D - 1}), i -> named_struct(" +
      s"'r', i, 'b', pmod(xxhash64($keyCol, i), $W)))"

  /** The deterministic one-sided bound the verdict rows pin:
    * `est_n <= exact_n + EpsMul * N / W`. CMS's PROBABILISTIC
    * guarantee is est ≤ exact + εN with ε = e/w at confidence
    * 1 − 2^−d; the rows emit a deterministic true/false over the
    * actual data, so the multiplier carries margin (4, not the ~2.7
    * expectation-scale) against a new SF or data-generator change
    * flipping the constant-true oracle column false WITH NO CODE
    * DEFECT. If the correctness gate ever fails on `within_eps`,
    * verify the bound on the new data before suspecting a regression
    * — the obligation is per-SF, not per-commit. */
  val EpsMul = 4L
}
