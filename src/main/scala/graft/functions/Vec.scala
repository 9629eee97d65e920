package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector ops over `array<float>` embedding columns.
  *
  * All similarity math runs on *integer-quantized* vectors
  * (`floor(x * 1000)` per component — the int8/int16 quantization
  * trick used by large-scale ANN systems, here at 3-decimal
  * precision). Integer dot products are exact and associative, so
  * scores are identical on any partitioning / cluster size — a float
  * dot product would drift in the last ulps between runs and engines.
  *
  * Everything below is built from codegen'd higher-order functions
  * (`transform`/`zip_with`/`aggregate`) — no UDFs, stays inside
  * whole-stage codegen.
  */
object Vec {

  /** Quantize `array<float>` → `array<long>` at 3 decimals — resolves
    * to the native codegen'd [[QuantizeVec]] kernel (registered via
    * [[Registry.ensure]], which every consuming operator calls).
    */
  def quantize(v: Column): Column = call_function("graft_quantize", v)

  /** Higher-order-function twin of [[quantize]] (differential-test
    * reference; registration-free).
    */
  def quantizeHof(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact squared L2 distance of two quantized vectors — the native
    * [[VecSqDist]] kernel (see [[Registry.ensure]]).
    */
  def sqd2(a: Column, b: Column): Column = call_function("graft_sqd2", a, b)

  /** Higher-order-function twin of [[sqd2]]. */
  def sqd2Hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Elementwise difference of two quantized vectors (residuals) —
    * the native [[VecSubtract]] kernel.
    */
  def subQ(a: Column, b: Column): Column = call_function("graft_vec_sub", a, b)

  /** Argmin centroid slot against an inlined `array<array<long>>`
    * table — the native [[NearestCode]] kernel; min(struct(d2, slot))
    * tie-break like `assignCells`.
    */
  def nearestCode(v: Column, cents: Column): Column =
    call_function("graft_nearest_code", v, cents)

  /** Exact integer dot product of two quantized vectors — resolves to
    * the native codegen'd [[LongDotProduct]] (see [[Registry.ensure]];
    * operators register it on their input's session).
    */
  def dotQ(a: Column, b: Column): Column = call_function("graft_dotq", a, b)

  /** Higher-order-function formulation of the same dot product (kept
    * as the registration-free fallback and as the differential-test
    * twin of [[LongDotProduct]]).
    */
  def dotQHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Euclidean norm of a quantized vector (double, deterministic). */
  def normQ(a: Column): Column = sqrt(dotQ(a, a).cast("double"))

  /** Cosine similarity of two quantized vectors. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") / (normQ(a) * normQ(b))

  /** Signed projection of a quantized vector onto a ±1 hyperplane
    * (for sign-random-projection LSH): true if dot(v, plane) > 0.
    * Runs through the native [[LongDotProduct]] kernel — integer
    * multiply/add in the same order as the HOF form, bit-identical.
    */
  def planeSide(v: Column, plane: Seq[Int]): Column =
    dotQ(v, typedlit(plane.map(_.toLong))) > 0
}
